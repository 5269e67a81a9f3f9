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
        rescore: bool = False,
        rescore_width: int = 4,
        recall_target: Optional[float] = None,
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
        self.engine = RetrievalEngine(
            self.mesh, k=self.k, approx=approx, quantize=quantize,
            rescore=rescore, rescore_width=rescore_width,
            recall_target=recall_target,
        )
        self.engine.set_gallery(index["embeddings"])
        self.pair_ids = np.asarray(index["pair_ids"])
        self.store = index.get("store")  # [G, g, g, C] fp16 mmap or None
        self.encode_query = make_query_encoder(core_cfg)
        self.decode_dir = Path(decode_dir) if decode_dir else None
        self._decode = None
        self._decode_hbm = None
        self._binarize = None  # jitted on first decode
        self._fused = None  # single-dispatch serving graph (built lazily)
        self._syn_cache: Dict[int, tuple] = {}  # bounded synthetic-query memo
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
        # deterministic function of seed -> safe to memoize (bounded): the
        # SyntheticDataset sample draws a full query image before the
        # support triple (rng-stream compatibility with tests/bench), which
        # is ~150 ms of host randn per request on a small host
        seed = int(seed)
        cached = self._syn_cache.get(seed)
        if cached is not None:
            return cached
        from cor_tpu.data.pipeline import SyntheticDataset

        ds = SyntheticDataset(
            length=1,
            query_img_size=self.cfg.encoder.img_size,
            support_img_size=self.cfg.support.siglip.vision.image_size,
            context_length=self.cfg.support.siglip.text.context_length,
            vocab_size=self.cfg.support.siglip.text.vocab_size,
            seed=seed,
        )
        s = ds[0]
        out = (s["support_img"], s["support_mask"], s["text"])
        if len(self._syn_cache) >= 64:
            self._syn_cache.pop(next(iter(self._syn_cache)))
        self._syn_cache[seed] = out
        return out

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

    def _assemble(self, request: Dict):
        """Request dict -> (support_img, support_mask, text_ids) host arrays.
        Raises on malformed requests."""
        if "synthetic" in request:
            return self._synthetic_query(request["synthetic"])
        return self._file_query(request)

    def handle(self, request: Dict, save_masks: bool = True) -> Dict:
        """One request -> one response dict. Raises on malformed requests;
        the CLI loop converts that into an error response. ``save_masks``
        is the out-of-band warmup switch (decode compiles/executes, nothing
        is written) — NOT an in-band magic id, which an untrusted client
        could collide with."""
        assembled = self._assemble(request)
        return self._respond_batch([request], [assembled], save_masks)[0]

    def handle_batch(self, requests: List[Dict], save_masks: bool = True) -> List[Dict]:
        """N requests -> N responses (order preserved) with ONE encode, ONE
        gallery scan, and ONE candidate-mask decode dispatch for the whole
        batch. Dispatch count — the dominant per-request cost on a relay-
        attached chip, and underutilized MXU tiles at Q=1 on any chip — is
        amortized across the batch; arrays are padded to power-of-two buckets
        so compiled shapes stay few. A malformed request yields an error
        response for that slot without failing its batchmates."""
        assembled, errors = [], {}
        good_requests = []
        for slot, req in enumerate(requests):
            try:
                assembled.append(self._assemble(req))
                good_requests.append(req)
            except Exception as e:  # isolate per-request assembly failures
                rid = req.get("id") if isinstance(req, dict) else None
                errors[slot] = {"id": rid, "error": f"{type(e).__name__}: {e}"}
        good = iter(
            self._respond_batch(good_requests, assembled, save_masks)
            if assembled else []
        )
        return [errors[s] if s in errors else next(good) for s in range(len(requests))]

    @staticmethod
    def _bucket(n: int) -> int:
        b = 1
        while b < n:
            b *= 2
        return b

    def _build_fused(self):
        """ONE device dispatch per serving batch: encode -> sharded scan ->
        store-indexed decode -> on-device binarize+bit-pack, fused under a
        single jit (each stage is itself a jitted fn — they inline). The
        split pipeline paid 3-4 dispatch round trips per batch, which the
        r5 TCP measurement found to be the dominant per-batch cost once the
        host work went native (BASELINE.md) — and fewer dispatches is a
        real win on PCIe hardware too. Available when the store is
        HBM-resident and rescore is off (the exact rescore stage is a host
        stage by design, so it splits the graph)."""
        import jax
        import jax.numpy as jnp

        k = self.k
        encode_fn = self.encode_query
        retrieve_fn = self.engine._retrieve
        decode_fn = self._decode_hbm
        quantize = self.engine.quantize
        _w = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)

        @jax.jit
        def fused(params, store_q, store_scales, gal_emb, gal_idx, gal_scales,
                  imgs, texts, masks):
            q = encode_fn(params, imgs, texts, masks)  # [Bp, D]
            extra = (gal_scales,) if quantize else ()
            scores, idx = retrieve_fn(q, gal_emb, gal_idx, *extra)
            scores = jnp.where(idx < 0, -jnp.inf, scores)
            order = jnp.argsort(-scores, axis=1)
            scores = jnp.take_along_axis(scores, order, axis=1)[:, :k]
            idx = jnp.take_along_axis(idx, order, axis=1)[:, :k]
            k_eff = idx.shape[1]  # == k unless the gallery is smaller
            n = idx.shape[0] * k_eff
            # n is STATIC per Bp bucket (Bp is bucketed upstream), so no
            # power-of-two rounding is needed to bound compiled shapes —
            # pad only to the decode kernel's best G=4 candidate grouping.
            # vs bucket(n): 40 -> 40 instead of 64 at the max_batch=4/k=10
            # sweet spot (37% less decode work per dispatch).
            npad = -(-n // 8) * 8
            flat_idx = jnp.clip(idx.reshape(-1), 0, store_q.shape[0] - 1)
            flat_idx = jnp.concatenate(
                [flat_idx, jnp.zeros((npad - n,), flat_idx.dtype)]
            ).astype(jnp.int32)
            feats = jnp.repeat(q, k_eff, axis=0)
            feats = jnp.concatenate(
                [feats, jnp.broadcast_to(feats[:1], (npad - n, feats.shape[1]))]
            )
            logits = decode_fn(params, store_q, store_scales, flat_idx, feats)
            b = (logits[:n] > 0).astype(jnp.uint8)
            b = b.reshape(*b.shape[:-1], b.shape[-1] // 8, 8)
            packed = (b * _w).sum(axis=-1).astype(jnp.uint8)
            return scores, idx, packed  # packed [n, 1, 4g, 4g/8]

        return fused

    def _respond_batch(self, requests, assembled, save_masks: bool) -> List[Dict]:
        import jax.numpy as jnp

        B = len(assembled)
        Bp = self._bucket(B)
        # pad by repeating the first row: keeps values in-distribution and
        # every compiled shape a power of two
        rows = assembled + [assembled[0]] * (Bp - B)
        imgs = jnp.asarray(np.stack([r[0] for r in rows]))
        masks = jnp.asarray(np.stack([r[1] for r in rows]))
        texts = jnp.asarray(np.stack([r[2] for r in rows]))

        if self._decode_hbm is not None and not self.engine.rescore:
            # single-dispatch fast path (see _build_fused)
            if self._fused is None:
                self._fused = self._build_fused()
            g = self.engine.gallery
            extra = g.scales if self.engine.quantize else jnp.zeros((0,))
            scores, idx, packed = self._fused(
                self.params, self._store_q, self._store_scales,
                g.embeddings, g.indices, extra, imgs, texts, masks,
            )
            scores = np.asarray(scores)[:B]
            idx = np.asarray(idx)[:B]
            dec = np.unpackbits(np.asarray(packed), axis=-1)  # [Bp*k,1,H,W]
            dec_masks = dec[: B * self.k, 0].reshape(B, self.k, *dec.shape[2:])
            resps: List[Dict] = []
            for b, req in enumerate(requests):
                resp = {
                    "id": req.get("id"),
                    "results": [
                        {"pair_id": int(self.pair_ids[i]), "score": float(s)}
                        for i, s in zip(idx[b], scores[b])
                    ],
                }
                resp["masks"] = self._save_masks(
                    req.get("id"), idx[b], dec_masks[b], save=save_masks
                )
                resps.append(resp)
            return resps

        q = self.encode_query(self.params, imgs, texts, masks)  # [Bp, D]
        scores, idx = self.engine.retrieve(q)
        scores = np.asarray(scores)[:B, : self.k]
        idx = np.asarray(idx)[:B, : self.k]

        resps: List[Dict] = []
        for b, req in enumerate(requests):
            resps.append({
                "id": req.get("id"),
                "results": [
                    {"pair_id": int(self.pair_ids[i]), "score": float(s)}
                    for i, s in zip(idx[b], scores[b])
                ],
            })
        if self._decode is not None or self._decode_hbm is not None:
            masks = self._decode_logits_batch(idx, q[:B])  # [B, k, 4g, 4g] u8
            for b, resp in enumerate(resps):
                resp["masks"] = self._save_masks(
                    requests[b].get("id"), idx[b], masks[b], save=save_masks
                )
        return resps

    # host-stream decode ships fp32 candidate rows ([g, g, C] ~4.2 MB each at
    # flagship geometry); cap rows per dispatch so a large --max-batch x k
    # cannot materialize an unbounded device buffer (B=8, k=10 would be
    # ~0.5 GB in one ship — chunked it peaks at cap x 4.2 MB)
    HOST_STREAM_DECODE_CAP = 32

    def _decode_logits_batch(self, idx: np.ndarray, q) -> np.ndarray:
        """[B, k] candidate rows + [B, D] query feats -> BINARIZED masks
        [B, k, 4g, 4g] uint8 (0/1). HBM-resident store: ONE dispatch
        (flattened to B*k candidates, padded to a power-of-two bucket).
        Host-streamed store: chunked at HOST_STREAM_DECODE_CAP rows per
        dispatch to bound the shipped fp32 buffer.

        Binarization AND bit-packing happen ON DEVICE: the serving
        threshold sigmoid(logit) > 0.5 is exactly logit > 0, and 8 pixels
        pack into one byte — the fetch moves 32x less than fp32 logits
        across PCIe (and this relay, where the per-batch mask fetch was
        measured to be the dominant serving cost after the r5 native PNG
        encoder removed the host-encode cost)."""
        import jax
        import jax.numpy as jnp

        B, k = idx.shape
        n = B * k
        flat_idx = idx.reshape(-1)
        feats_np = np.repeat(np.asarray(q), k, axis=0)  # [B*k, D]
        if self._binarize is None:
            # binarize AND bit-pack on device: sigmoid>0.5 == logit>0, and
            # 8 mask pixels pack into one byte (bitorder matches
            # np.unpackbits' default big-endian), so the host fetch moves
            # 8x less than uint8 masks — 32x less than fp32 logits. At
            # k=10 256^2 masks that is 80 KB/request instead of 640 KB
            # (2.6 MB -> 0.33 MB per max_batch=4 dispatch), which turns the
            # per-batch fetch from the dominant serving cost into noise on
            # this few-MB/s relay and is a real PCIe win on a TPU-VM too.
            _w = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)

            def _pack(x):  # [n, 1, H, W] logits -> [n, 1, H, W//8] bytes
                assert x.shape[-1] % 8 == 0, x.shape  # masks are 4*grid wide
                b = (x > 0).astype(jnp.uint8)
                b = b.reshape(*b.shape[:-1], b.shape[-1] // 8, 8)
                return (b * _w).sum(axis=-1).astype(jnp.uint8)

            self._binarize = jax.jit(_pack)
        if self._decode_hbm is not None:
            # store-indexed decode straight out of the HBM-resident int8
            # store: row indices are cheap, no chunking needed
            npad = self._bucket(n)
            pidx = np.concatenate([flat_idx, np.full(npad - n, idx[0, 0])])
            feats = jnp.asarray(np.concatenate(
                [feats_np, np.broadcast_to(feats_np[:1], (npad - n, feats_np.shape[1]))]
            ))
            masks = np.asarray(self._binarize(
                self._decode_hbm(
                    self.params, self._store_q, self._store_scales,
                    jnp.asarray(pidx.astype(np.int32)), feats,
                )
            ))  # [npad, 1, 4g, 4g] uint8
        else:
            # host-streamed: gather the mmap'd fp16 rows, ship, decode — in
            # chunks so device memory stays bounded regardless of B*k
            cap = self.HOST_STREAM_DECODE_CAP
            chunks = []
            for s in range(0, n, cap):
                cidx = flat_idx[s:s + cap]
                m = len(cidx)
                mpad = self._bucket(m)
                cidx = np.concatenate([cidx, np.full(mpad - m, flat_idx[0])])
                cf = np.concatenate(
                    [feats_np[s:s + m],
                     np.broadcast_to(feats_np[:1], (mpad - m, feats_np.shape[1]))]
                )
                cand = jnp.asarray(np.asarray(self.store[cidx], np.float32))
                out = np.asarray(self._binarize(
                    self._decode(self.params, cand, jnp.asarray(cf))
                ))
                chunks.append(out[:m])
            masks = np.concatenate(chunks)  # [n, 1, 4g, 4g/8] packed bytes
        # unpack the device's bit-packed bytes back to 0/1 pixels (cheap C
        # loop; big-endian bit order matches the packer above)
        masks = np.unpackbits(masks, axis=-1)
        return masks[:n, 0].reshape(B, k, *masks.shape[2:])

    def _save_masks(self, req_id, idx: np.ndarray, masks: np.ndarray,
                    save: bool = True) -> List[str]:
        """Write one PNG per retrieved candidate for one request. ``masks``
        is [k, 4g, 4g] uint8 0/1, already binarized ON DEVICE
        (sigmoid > 0.5 == logit > 0 — _decode_logits_batch).

        Encoding goes through the C++ data plane's GIL-released PNG encoder
        (native.png_encode_gray, zlib level 1) — the k Pillow level-6
        encodes per request were the dominant HOST cost of a serving
        request (measured ~19 ms each at 256^2 vs ~1.4 ms native), and the
        GIL release lets TCP writer threads overlap encodes with the next
        device dispatch. Falls back to Pillow (level 1) without a
        compiler."""
        if not save:  # warmup: compile + execute, write nothing
            return []
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
        from cor_tpu.native import native_available, png_encode_gray

        use_native = native_available()
        if not use_native:
            from PIL import Image
        paths = []
        for j, gallery_row in enumerate(idx):
            m = masks[j] * np.uint8(255)
            p = self.decode_dir / f"{safe_id}_{int(self.pair_ids[gallery_row])}.png"
            if use_native:
                with open(p, "wb") as f:
                    f.write(png_encode_gray(m, level=1))
            else:
                Image.fromarray(m, "L").save(p, compress_level=1)
            paths.append(str(p))
        return paths

    def warmup(self, batch_buckets=(1,)) -> None:
        """Compile every jitted callable on synthetic requests so the first
        real request pays no compile latency. ``batch_buckets`` lists the
        power-of-two batch sizes to pre-compile (the CLI passes every bucket
        up to its --max-batch)."""
        for b in batch_buckets:
            self.handle_batch(
                [{"id": "warmup", "synthetic": i} for i in range(b)],
                save_masks=False,
            )
        log.info("RetrievalServer warm: gallery=%d k=%d decode=%s buckets=%s",
                 len(self.pair_ids), self.k,
                 "hbm-int8" if self._decode_hbm is not None
                 else self._decode is not None, list(batch_buckets))
