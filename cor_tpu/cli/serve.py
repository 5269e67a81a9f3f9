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


def process_lines(server, raw_lines):
    """One serving tick: parse a drained batch of JSON lines, answer the
    well-formed requests with ONE ``handle_batch`` call, and return responses
    in input order (parse failures become error responses in their own slot;
    a whole-batch dispatch failure falls back to per-request handling so one
    poisoned request cannot take down its batchmates)."""

    def _error_resp(line, e):
        resp = {"id": None, "error": f"{type(e).__name__}: {e}"}
        try:
            parsed = json.loads(line)
            if isinstance(parsed, dict):
                resp["id"] = parsed.get("id")
        except Exception:
            pass
        return resp

    entries = []  # (kind, payload) per non-empty line, order preserved
    for raw in raw_lines:
        raw = raw.strip()
        if not raw:
            continue
        try:
            req = json.loads(raw)
            if not isinstance(req, dict):
                raise ValueError("request must be a JSON object")
            entries.append(("req", req))
        except Exception as e:
            entries.append(("err", _error_resp(raw, e)))
    reqs = [payload for kind, payload in entries if kind == "req"]
    try:
        batch_resps = iter(server.handle_batch(reqs))
    except Exception as e:  # whole-batch failure: retry one by one
        logging.getLogger("cor_tpu.serve").warning(
            "batch dispatch failed (%s: %s); retrying requests singly",
            type(e).__name__, e,
        )

        def _single(r):
            try:
                return server.handle(r)
            except Exception as ee:
                return {"id": r.get("id"), "error": f"{type(ee).__name__}: {ee}"}

        batch_resps = iter([_single(r) for r in reqs])
    # next() default guards against a handle_batch that violates the
    # len(resps)==len(reqs) contract: a short batch must degrade to error
    # responses, not raise StopIteration out of the serving loop
    return [payload if kind == "err"
            else next(batch_resps, {"id": None, "error": "missing response"})
            for kind, payload in entries]


def power_of_two_buckets(max_batch: int) -> list:
    """[1, 2, 4, ..., >= max_batch] — the warmup bucket ladder shared by the
    CLI loops and benches (one policy, one place: a missed copy reintroduces
    JIT compiles inside timed/served regions)."""
    buckets = [1]
    while buckets[-1] < max_batch:
        buckets.append(buckets[-1] * 2)
    return buckets


MAX_LINE_BYTES = 1 << 20  # TCP clients are untrusted: cap request lines


def serve_tcp(server, host: str, port: int, max_batch: int, ready_event=None):
    """Multi-client TCP line-protocol front end: one JSON request per line,
    one JSON response per line, per connection. A reader thread per client
    feeds a single bounded inbox; ONE dispatcher thread drains up to
    max_batch queued requests — ACROSS clients — into each device dispatch,
    so concurrent clients get cross-request micro-batching that the
    stdin/stdout loop could only provide within one producer.

    Isolation against untrusted/slow clients:
    - request lines are capped at MAX_LINE_BYTES (a newline-less stream
      cannot grow host memory; the connection is dropped);
    - responses go through a bounded PER-CONNECTION outbox drained by a
      writer thread — a client that stops reading fills its own outbox and
      is disconnected, instead of a blocking sendall freezing the shared
      dispatcher (head-of-line blocking every other client);
    - inbox backpressure still propagates to well-behaved clients via TCP
      flow control (readers block on the bounded inbox).

    Returns the bound (host, port) after listening starts; binding defaults
    to loopback at the CLI (--tcp-host to expose — requests carry
    client-chosen FILE PATHS, so only trusted networks should reach this)."""
    import queue
    import socket
    import threading

    log = logging.getLogger("cor_tpu.serve")
    inbox: "queue.Queue" = queue.Queue(maxsize=max(8, 4 * max_batch))
    CLOSE = object()

    class Client:
        def __init__(self, conn, addr):
            self.conn = conn
            self.addr = addr
            self.outbox: "queue.Queue" = queue.Queue(maxsize=max(16, 8 * max_batch))
            self.dead = False

        def send(self, resp: dict):
            """Dispatcher-side: enqueue without ever blocking; a full outbox
            means the client stopped reading — drop it."""
            if self.dead:
                return
            try:
                self.outbox.put_nowait(resp)
            except queue.Full:
                log.info("client %s not consuming responses; dropping", self.addr)
                self.kill()

        def kill(self):
            self.dead = True
            try:
                self.outbox.put_nowait(None)
            except queue.Full:
                # writer is alive but behind: it will hit the closed socket
                pass
            try:
                self.conn.close()
            except Exception:
                pass

        def finish(self):
            """Graceful close: enqueue the sentinel WITHOUT marking dead, so
            the writer drains every already-answered response before closing.
            Pipelined clients that shutdown their write side (cat reqs |
            nc -N) must still receive answers the server already produced —
            the reader's CLOSE is FIFO-ordered after all their requests, and
            the dispatcher sends a batch's responses before processing its
            CLOSEs, so nothing is enqueued after the sentinel. Immediate
            kill() remains the policy only for write errors and slow
            consumers (full outbox)."""
            if self.dead:
                return
            try:
                self.outbox.put_nowait(None)
            except queue.Full:
                self.kill()  # outbox full == client stopped reading

    def writer(client: Client):
        while True:
            resp = client.outbox.get()
            if resp is None or client.dead:
                if not client.dead:  # graceful drain finished: close now
                    try:
                        client.conn.close()
                    except Exception:
                        pass
                return
            try:
                client.conn.sendall((json.dumps(resp) + "\n").encode())
            except Exception as e:
                log.info("client %s write failed: %s", client.addr, e)
                client.kill()
                return

    def reader(client: Client):
        buf = b""
        try:
            while True:
                chunk = client.conn.recv(65536)
                if not chunk:
                    break
                buf += chunk
                while True:
                    nl = buf.find(b"\n")
                    if nl < 0:
                        break
                    line = buf[:nl].decode("utf-8", errors="replace")
                    buf = buf[nl + 1:]
                    if line.strip():
                        inbox.put((client, line))
                if len(buf) > MAX_LINE_BYTES:
                    log.info("client %s exceeded %d-byte line cap; dropping",
                             client.addr, MAX_LINE_BYTES)
                    break
        except Exception as e:
            if not client.dead:
                log.info("client %s reader ended: %s", client.addr, e)
        finally:
            inbox.put((client, CLOSE))

    def dispatcher():
        while True:
            client, line = inbox.get()
            batch = [(client, line)]
            while len(batch) < max_batch:
                try:
                    batch.append(inbox.get_nowait())
                except queue.Empty:
                    break
            closes = [c for c, l in batch if l is CLOSE]
            batch = [(c, l) for c, l in batch if l is not CLOSE]
            if batch:
                try:
                    resps = process_lines(server, [l for _, l in batch])
                except Exception as e:
                    # process_lines already isolates per-request and whole-
                    # batch failures; anything escaping is a server bug —
                    # answer the batch with errors instead of silently
                    # killing the dispatcher thread (which would hang every
                    # connected client forever)
                    log.exception("dispatcher batch failed: %s", e)
                    resps = [
                        {"id": None, "error": f"internal: {type(e).__name__}"}
                        for _ in batch
                    ]
                # process_lines answers every non-blank line in order, and
                # readers only enqueue non-blank lines — slots align
                for (c, _), resp in zip(batch, resps):
                    c.send(resp)
            for c in closes:
                c.finish()

    threading.Thread(target=dispatcher, daemon=True).start()

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    srv.listen(64)
    bound = srv.getsockname()
    log.info("serving TCP on %s:%d (max_batch=%d)", bound[0], bound[1], max_batch)
    if ready_event is not None:
        ready_event.bound = bound
        ready_event.set()
    try:
        while True:
            conn, addr = srv.accept()
            conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            client = Client(conn, addr)
            threading.Thread(target=writer, args=(client,), daemon=True).start()
            threading.Thread(target=reader, args=(client,), daemon=True).start()
    except KeyboardInterrupt:
        log.info("TCP server interrupted; closing")
    finally:
        srv.close()
    return bound


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
    parser.add_argument("--rescore", action="store_true",
                        help="two-stage scan: widened device pool + exact "
                             "fp32 host rescore (recovers --approx/--int8 "
                             "ranking loss; matrix in BASELINE.md)")
    parser.add_argument("--rescore-width", type=int, default=4, metavar="W",
                        help="first-stage pool width multiplier for "
                             "--rescore (pool = W*k)")
    parser.add_argument("--recall-target", type=float, default=None,
                        metavar="R",
                        help="approx_max_k recall target for --approx "
                             "(default 0.99; 0.999 with --rescore)")
    parser.add_argument("--decode-masks", default=None, metavar="DIR",
                        help="also decode + save top-k candidate masks "
                        "(requires an index built --with-store)")
    parser.add_argument("--store-hbm", action="store_true",
                        help="keep the candidate store HBM-resident as int8 "
                             "(4x less HBM than fp32; in-kernel dequant) "
                             "instead of host-streaming rows per request")
    parser.add_argument("--self-test", type=int, default=0, metavar="N",
                        help="serve N synthetic requests and exit (smoke mode)")
    parser.add_argument("--tcp", type=int, default=0, metavar="PORT",
                        help="serve a multi-client TCP line protocol on this "
                             "port instead of stdin/stdout (0 = stdio). "
                             "Requests micro-batch ACROSS clients up to "
                             "--max-batch per device dispatch")
    parser.add_argument("--tcp-host", default="127.0.0.1", metavar="ADDR",
                        help="TCP bind address (default loopback: requests "
                             "carry client-chosen file paths, so expose "
                             "beyond localhost only on trusted networks)")
    parser.add_argument("--max-batch", type=int, default=1, metavar="B",
                        help="micro-batch up to B already-queued requests "
                             "into one encode/scan/decode dispatch (power-of-"
                             "two buckets; latency of an isolated request is "
                             "unchanged — batching only engages when requests "
                             "are waiting)")
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
        rescore=args.rescore,
        rescore_width=args.rescore_width,
        recall_target=args.recall_target,
    )
    max_batch = max(1, args.max_batch)
    server.warmup(batch_buckets=power_of_two_buckets(max_batch))

    if args.tcp:
        serve_tcp(server, args.tcp_host, args.tcp, max_batch)
        return

    if args.self_test:
        for start in range(0, args.self_test, max_batch):
            reqs = [{"id": i, "synthetic": i}
                    for i in range(start, min(start + max_batch, args.self_test))]
            for resp in server.handle_batch(reqs):
                print(json.dumps(resp), flush=True)
        return

    # stdin is drained by a reader thread into a queue so the serving loop
    # can micro-batch every request that queued while the previous batch was
    # on-device — select() on a buffered stdin misses lines Python already
    # consumed, a thread + queue does not
    import queue
    import threading

    # bounded so the reader blocks when the device falls behind — restores
    # the OS-pipe backpressure a direct-read loop would have had (a client
    # faster than the device otherwise grows host memory without bound)
    lines: "queue.Queue" = queue.Queue(maxsize=max(8, 4 * max_batch))
    def _reader():
        for raw in sys.stdin:
            lines.put(raw)
        lines.put(None)  # EOF sentinel
    threading.Thread(target=_reader, daemon=True).start()

    eof = False
    while not eof:
        batch_raw = [lines.get()]
        if batch_raw[0] is None:
            break
        while len(batch_raw) < max_batch:
            try:
                nxt = lines.get_nowait()
            except queue.Empty:
                break
            if nxt is None:
                eof = True
                break
            batch_raw.append(nxt)
        for resp in process_lines(server, batch_raw):
            print(json.dumps(resp), flush=True)


if __name__ == "__main__":
    main()
