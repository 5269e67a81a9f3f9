"""Retrieval serving entry point: JSON-lines on stdin/stdout.

Production-serving half of the north-star retrieval capability (the build
side is `cor_tpu.cli.index`; there is no reference analog — my_test.py only
dumps masks offline):

    python -m cor_tpu.cli.index --config cfg.yaml --out /data/idx --with-store
    python -m cor_tpu.cli.serve --config cfg.yaml --gallery-index /data/idx \
        --k 10 --decode-masks /data/pred <<'EOF'
    {"id": 1, "support_img": "s.jpg", "support_mask": "m.png", "text": "..."}
    EOF

One request per input line; one JSON response per output line (stdout is
reserved for responses — logs go to stderr). `{"synthetic": <seed>}` requests
generate a deterministic random query, which is also how `--self-test N`
smoke-drives the full path without any data on disk.
"""

from __future__ import annotations

import argparse
import logging
import json
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(description="cor_tpu retrieval server")
    parser.add_argument("--config", required=True)
    parser.add_argument("--gallery-index", required=True, metavar="DIR",
                        help="artifact built by cor_tpu.cli.index")
    parser.add_argument("--k", type=int, default=10)
    parser.add_argument("--approx", action="store_true",
                        help="approx_max_k local scan (recall_target 0.99)")
    parser.add_argument("--int8", action="store_true",
                        help="int8 per-row-quantized gallery scan (4x less "
                             "gallery HBM; accuracy measured in BASELINE.md)")
    parser.add_argument("--decode-masks", default=None, metavar="DIR",
                        help="also decode + save top-k candidate masks "
                        "(requires an index built --with-store)")
    parser.add_argument("--store-hbm", action="store_true",
                        help="keep the candidate store HBM-resident as int8 "
                             "(4x less HBM than fp32; in-kernel dequant) "
                             "instead of host-streaming rows per request")
    parser.add_argument("--self-test", type=int, default=0, metavar="N",
                        help="serve N synthetic requests and exit (smoke mode)")
    args = parser.parse_args(argv)

    import jax

    from cor_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()

    from cor_tpu.config import load_eval_config
    from cor_tpu.models.core_model import init_core_model
    from cor_tpu.retrieval.index import load_gallery_index
    from cor_tpu.retrieval.serve import RetrievalServer
    from cor_tpu.utils.convert import load_sam_weights, load_siglip_weights

    cfg = load_eval_config(args.config)
    core_cfg = cfg.core_config()
    params = init_core_model(jax.random.PRNGKey(cfg.seed), core_cfg)
    if cfg.load_sam_pretrained_checkpoint:
        params = load_sam_weights(
            params, cfg.load_sam_pretrained_checkpoint, core_cfg.encoder.depth
        )
    if cfg.load_siglip_pretrained_checkpoint:
        sig = core_cfg.support.siglip
        params = load_siglip_weights(
            params, cfg.load_siglip_pretrained_checkpoint, sig.vision.depth, sig.text.depth
        )
    if cfg.load_checkpoint_path:
        from cor_tpu.utils.convert import load_trained_params

        # trained CORE weights (torch .pth or any Orbax training layout) —
        # without this the server would silently use untrained fusion/
        # decoder weights while the config promises a trained model
        params = load_trained_params(
            cfg.load_checkpoint_path, core_cfg, params,
            logging.getLogger("cor_tpu.serve"), cfg.mask_pooling,
        )

    index = load_gallery_index(args.gallery_index)
    server = RetrievalServer(
        core_cfg,
        params,
        index,
        k=args.k,
        approx=args.approx,
        quantize=args.int8,
        decode_dir=args.decode_masks,
        tokenizer_path=cfg.tokenizer_path,
        store_hbm=args.store_hbm,
    )
    server.warmup()

    if args.self_test:
        for i in range(args.self_test):
            print(json.dumps(server.handle({"id": i, "synthetic": i})), flush=True)
        return

    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
            resp = server.handle(req)
        except Exception as e:  # a malformed request must not kill the server
            resp = {"id": None, "error": f"{type(e).__name__}: {e}"}
            try:
                resp["id"] = json.loads(line).get("id")
            except Exception:
                pass
        print(json.dumps(resp), flush=True)


if __name__ == "__main__":
    main()
