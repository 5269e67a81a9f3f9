"""Online retrieval serving: load a prebuilt gallery index once, answer
composed queries forever.

Deployment-side capability with no reference analog (the reference's
my_test.py only dumps per-triplet masks; SURVEY.md §0): `cor_tpu.cli.index`
builds the artifact, this module serves it. One `RetrievalServer` owns

- the sharded gallery scan (cor_tpu.retrieval.engine — embeddings live
  data-axis-sharded in HBM, local top-k + ICI merge per query),
- the live query encoder (support branch: SigLIP towers + mask pooling +
  fusion — the only per-request encode work),
- optionally the candidate mask decoder against the artifact's stored SAM
  image embeddings, so retrieved objects are segmented without touching
  their source images.

Request/response are plain dicts (the CLI speaks them as JSON lines):

    {"id": 7, "support_img": "s.jpg", "support_mask": "m.png",
     "text": "make the cat blue"}                       # or "synthetic": seed
 -> {"id": 7, "results": [{"pair_id": 123, "score": 0.83}, ...],
     "masks": ["out/7_123.png", ...]}                   # when decoding

All jitted callables are compiled once at startup (`warmup()`), so request
latency is pure device time + host IO.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

log = logging.getLogger("cor_tpu.serve")


class RetrievalServer:
    def __init__(
        self,
        core_cfg,
        params,
        index: Dict[str, np.ndarray],
        k: int = 10,
        approx: bool = False,
        quantize: bool = False,
        decode_dir: Optional[str] = None,
        tokenizer_path: Optional[str] = None,
        mesh=None,
        store_hbm: bool = False,
    ):
        from cor_tpu.data.tokenizer import get_tokenizer
        from cor_tpu.parallel import make_mesh
        from cor_tpu.retrieval.engine import RetrievalEngine
        from cor_tpu.retrieval.index import (
            make_candidate_mask_decoder,
            make_query_encoder,
        )

        self.cfg = core_cfg
        self.params = params
        self.k = min(k, len(index["pair_ids"]))
        self.mesh = mesh if mesh is not None else make_mesh()
        self.engine = RetrievalEngine(self.mesh, k=self.k, approx=approx, quantize=quantize)
        self.engine.set_gallery(index["embeddings"])
        self.pair_ids = np.asarray(index["pair_ids"])
        self.store = index.get("store")  # [G, g, g, C] fp16 mmap or None
        self.encode_query = make_query_encoder(core_cfg)
        self.decode_dir = Path(decode_dir) if decode_dir else None
        self._decode = None
        self._decode_hbm = None
        self._anon_requests = 0  # fallback filename counter for id-less requests
        if self.decode_dir is not None and self.store is None:
            raise ValueError(
                "decode_dir requested but the gallery index carries no image-"
                "embedding store — rebuild it with cor_tpu.cli.index --with-store"
            )
        if store_hbm and self.decode_dir is None:
            raise ValueError(
                "store_hbm=True without decode_dir does nothing — the HBM-"
                "resident int8 store only serves the candidate-mask decode "
                "path; pass decode_dir (cli: --decode-masks) or drop the flag"
            )
        if self.decode_dir is not None:
            if store_hbm:
                # HBM-resident int8 store: quantize the mmap'd fp16 store on
                # the host chunk-by-chunk (pre-baking the dense no-mask
                # prompt), ship only the 4x-smaller int8 array, and decode
                # store-indexed — no per-request host gather/device_put
                import jax
                import jax.numpy as jnp

                from cor_tpu.retrieval.engine import quantize_candidate_store_host
                from cor_tpu.retrieval.index import make_store_indexed_mask_decoder

                no_mask = np.asarray(params["prompt_encoder"]["no_mask_embed"][0])
                q, scales = quantize_candidate_store_host(self.store, no_mask)
                self._store_q = jax.device_put(jnp.asarray(q))
                self._store_scales = jax.device_put(jnp.asarray(scales))
                self._decode_hbm = make_store_indexed_mask_decoder(core_cfg)
                log.info(
                    "candidate store HBM-resident: %s int8 rows (%.2f GB; "
                    "fp32 would be %.2f GB)",
                    q.shape[0], q.nbytes / 2**30, q.nbytes * 4 / 2**30,
                )
            else:
                self._decode = make_candidate_mask_decoder(core_cfg)
        self.tokenizer = get_tokenizer(
            tokenizer_path, core_cfg.support.siglip.text.context_length
        )

    # -- query assembly ----------------------------------------------------

    def _synthetic_query(self, seed: int):
        from cor_tpu.data.pipeline import SyntheticDataset

        ds = SyntheticDataset(
            length=1,
            query_img_size=self.cfg.encoder.img_size,
            support_img_size=self.cfg.support.siglip.vision.image_size,
            context_length=self.cfg.support.siglip.text.context_length,
            vocab_size=self.cfg.support.siglip.text.vocab_size,
            seed=int(seed),
        )
        s = ds[0]
        return s["support_img"], s["support_mask"], s["text"]

    def _file_query(self, request: Dict):
        from PIL import Image

        from cor_tpu.data.pipeline import _to_float_img

        size = self.cfg.support.siglip.vision.image_size
        img = Image.open(request["support_img"]).convert("RGB")
        mask = Image.open(request["support_mask"]).convert("L")
        return (
            _to_float_img(img, size, True),
            _to_float_img(mask, size, False),
            self.tokenizer(str(request.get("text", "")))[0],
        )

    # -- request handling ----------------------------------------------------

    def handle(self, request: Dict, save_masks: bool = True) -> Dict:
        """One request -> one response dict. Raises on malformed requests;
        the CLI loop converts that into an error response. ``save_masks``
        is the out-of-band warmup switch (decode compiles/executes, nothing
        is written) — NOT an in-band magic id, which an untrusted client
        could collide with."""
        import jax.numpy as jnp

        if "synthetic" in request:
            s_img, s_mask, text_ids = self._synthetic_query(request["synthetic"])
        else:
            s_img, s_mask, text_ids = self._file_query(request)

        q = self.encode_query(
            self.params,
            jnp.asarray(s_img)[None],
            jnp.asarray(text_ids)[None],
            jnp.asarray(s_mask)[None],
        )  # [1, D]
        scores, idx = self.engine.retrieve(q)
        scores = np.asarray(scores)[0, : self.k]
        idx = np.asarray(idx)[0, : self.k]

        resp: Dict = {
            "id": request.get("id"),
            "results": [
                {"pair_id": int(self.pair_ids[i]), "score": float(s)}
                for i, s in zip(idx, scores)
            ],
        }
        if self._decode is not None or self._decode_hbm is not None:
            resp["masks"] = self._decode_masks(
                request.get("id"), idx, q, save=save_masks
            )
        return resp

    def _decode_masks(self, req_id, idx: np.ndarray, q, save: bool = True) -> List[str]:
        import jax.numpy as jnp
        from PIL import Image

        self.decode_dir.mkdir(parents=True, exist_ok=True)
        # request ids come from UNTRUSTED client JSON: reduce to a filename-
        # safe token (no separators -> no path traversal out of decode_dir);
        # id-less requests get a per-server counter instead of colliding
        safe_id = "".join(
            ch for ch in str(req_id) if ch.isalnum() or ch in "-_."
        ).lstrip(".")
        if req_id is None or not safe_id:
            self._anon_requests += 1
            safe_id = f"req{self._anon_requests}"
        feats = jnp.broadcast_to(q, (len(idx), q.shape[1]))
        if self._decode_hbm is not None:
            # store-indexed decode straight out of the HBM-resident int8 store
            logits = np.asarray(
                self._decode_hbm(
                    self.params, self._store_q, self._store_scales,
                    jnp.asarray(idx.astype(np.int32)), feats,
                )
            )  # [K, 1, 4g, 4g]
        else:
            # host-streamed: gather the mmap'd fp16 rows, ship, decode
            cand = jnp.asarray(np.asarray(self.store[idx], np.float32))  # [K, g, g, C]
            logits = np.asarray(self._decode(self.params, cand, feats))  # [K, 1, 4g, 4g]
        if not save:  # warmup: compile + execute, write nothing
            return []
        paths = []
        for j, gallery_row in enumerate(idx):
            m = ((1 / (1 + np.exp(-logits[j, 0]))) > 0.5).astype(np.uint8) * 255
            p = self.decode_dir / f"{safe_id}_{int(self.pair_ids[gallery_row])}.png"
            Image.fromarray(m, "L").save(p)
            paths.append(str(p))
        return paths

    def warmup(self) -> None:
        """Compile every jitted callable on a synthetic request so the first
        real request pays no compile latency."""
        self.handle({"id": "warmup", "synthetic": 0}, save_masks=False)
        log.info("RetrievalServer warm: gallery=%d k=%d decode=%s",
                 len(self.pair_ids), self.k,
                 "hbm-int8" if self._decode_hbm is not None
                 else self._decode is not None)
