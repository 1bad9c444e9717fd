"""Production serving: dynamic micro-batching server around a Predictor.

The reference has no serving path at all; this is the deployment-side
complement to ``serving.Predictor``. The TPU wants few, large dispatches, so
concurrent client requests are coalesced by a single batcher thread: requests
queue up, the batcher drains up to ``max_batch`` rows (waiting at most
``max_wait_ms`` for stragglers), pads them into ONE ``Predictor.predict``
call — which routes to the fused Pallas kernel at small batches and the
sharded/XLA bulk path at large ones — and scatters results back to the
waiting clients. One device dispatch per micro-batch instead of one per
request.

Transport is a dependency-free ``ThreadingHTTPServer``:

- ``POST /predict``                 {"inputs": [[[...]...]]}  (B, T, D)
- ``POST /predict_autoregressive``  {"inputs": ..., "horizon": N}
- ``GET  /healthz``                 liveness + device info
- ``GET  /stats``                   requests/batches/mean batch size/latency

Programmatic use: ``BatchingPredictor`` wraps any Predictor with the same
coalescing for in-process multi-threaded callers.
"""

from __future__ import annotations

import json
import queue
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np


@dataclass
class _Pending:
    x: np.ndarray                       # (b_i, T, D)
    event: threading.Event = field(default_factory=threading.Event)
    result: Optional[np.ndarray] = None
    error: Optional[Exception] = None
    # set by a timed-out client; workers drop abandoned items instead of
    # spending device dispatches on results nobody will read
    abandoned: bool = False


class BatchingPredictor:
    """Coalesces concurrent ``predict`` calls into single device dispatches.

    Thread-safe; ``predict`` blocks until the batcher has served the request.
    ``max_batch`` bounds rows per dispatch (stays within the Predictor's
    fused-kernel window by default); ``max_wait_ms`` is the straggler window
    once at least one request is pending.

    Coalesced batches are zero-padded up to fixed power-of-two **buckets**
    (8, 16, ..., max_batch): XLA compiles one executable per bucket instead
    of one per observed batch size — essential on TPU, where an unseen shape
    costs a full jit compile mid-request. ``warmup(input_shape)`` compiles
    every bucket up front so no client ever waits on the compiler.

    ``devices``: optional list of ``jax.Device``s for serving REPLICATION —
    one worker per chip, each with its own parameter replica
    (``Predictor.replicate_to``), all pulling request waves from the shared
    queue. Work-steals by availability (an idle chip takes the next wave),
    so aggregate throughput scales with the pod slice while each request
    keeps single-chip latency. Distinct from ``Predictor(mesh=...)``, which
    shards ONE bulk batch across chips.
    """

    def __init__(self, predictor, *, max_batch: int = 128,
                 max_wait_ms: float = 2.0, devices=None):
        self._predictor = predictor
        self.devices = list(devices) if devices else None
        if self.devices:
            self._workers = [(predictor.replicate_to(d), d)
                             for d in self.devices]
        else:
            self._workers = [(predictor, None)]
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1e3
        self.buckets = []
        b = 8
        while b < max_batch:
            self.buckets.append(b)
            b *= 2
        self.buckets.append(max_batch)
        self._queue: "queue.Queue[_Pending]" = queue.Queue()
        self._parked: dict = {}  # thread-id -> held item (single worker)
        self._stats_lock = threading.Lock()
        self.n_requests = 0
        self.n_rows = 0
        self.n_batches = 0
        self.bucket_counts: dict = {}
        self.device_batches: dict = {}
        self.latency_sum = 0.0
        self._stop = threading.Event()
        self._threads = [
            threading.Thread(target=self._loop, args=(p, d), daemon=True)
            for p, d in self._workers
        ]
        for t in self._threads:
            t.start()

    # ------------------------------------------------------------- client API

    def predict(self, x: np.ndarray, timeout: Optional[float] = None) -> np.ndarray:
        """(b, T, D) -> (b, P, D); blocks until served (coalesced).

        ``timeout`` (seconds): raise TimeoutError instead of waiting
        forever — a request deadline for callers that must not hang on a
        stuck device."""
        t0 = time.perf_counter()
        item = _Pending(np.asarray(x, np.float32))
        self._queue.put(item)
        if not item.event.wait(timeout):
            item.abandoned = True  # workers drop it instead of serving it
            raise TimeoutError(
                f"predict not served within {timeout}s "
                f"(queue depth {self._queue.qsize()})")
        if item.error is not None:
            raise item.error
        with self._stats_lock:
            self.n_requests += 1
            self.n_rows += item.x.shape[0]
            self.latency_sum += time.perf_counter() - t0
        return item.result

    def stats(self) -> dict:
        with self._stats_lock:
            n = max(self.n_requests, 1)
            return {
                "requests": self.n_requests,
                "rows": self.n_rows,
                "batches": self.n_batches,
                "mean_batch_rows": self.n_rows / max(self.n_batches, 1),
                "bucket_counts": dict(self.bucket_counts),
                "device_batches": dict(self.device_batches),
                "mean_latency_ms": self.latency_sum / n * 1e3,
            }

    def close(self):
        self._stop.set()
        for t in self._threads:
            t.join(timeout=2.0)
        # unblock any clients still queued OR parked on a worker — even when
        # the worker never exits (stuck in a wedged device call), otherwise
        # their predict() calls hang forever after shutdown
        leftovers = []
        with self._stats_lock:
            leftovers.extend(self._parked.values())
            self._parked.clear()
        while True:
            try:
                leftovers.append(self._queue.get_nowait())
            except queue.Empty:
                break
        for item in leftovers:
            item.error = RuntimeError("BatchingPredictor closed")
            item.event.set()

    def _bucketed(self, rows: int) -> int:
        for b in self.buckets:
            if rows <= b:
                return b
        return rows  # above max_batch (single oversize request): exact shape

    def warmup(self, input_shape) -> None:
        """Compile every bucket before serving ((T, D) per-row shape) — on
        every device replica CONCURRENTLY, so startup stays near the
        single-replica cost instead of multiplying by the replica count
        (each remote compile is tens of seconds on the tunneled runtime)."""

        def warm_one(predictor, device):
            with self._device_ctx(device):
                for b in self.buckets:
                    x = np.zeros((b,) + tuple(input_shape), np.float32)
                    np.asarray(predictor.predict(x))

        if len(self._workers) == 1:
            warm_one(*self._workers[0])
            return
        errs = []

        def guarded(p, d):
            try:
                warm_one(p, d)
            except BaseException as e:
                errs.append(e)

        ts = [threading.Thread(target=guarded, args=w, daemon=True)
              for w in self._workers]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        if errs:
            raise errs[0]

    # ---------------------------------------------------------------- batcher

    @staticmethod
    def _device_ctx(device):
        if device is None:
            import contextlib

            return contextlib.nullcontext()
        import jax

        return jax.default_device(device)

    def _park(self, held):
        """Track a worker's held item so close() can unblock its client even
        if the worker never exits (e.g. stuck in a wedged device call)."""
        with self._stats_lock:
            if held is None:
                self._parked.pop(threading.get_ident(), None)
            else:
                self._parked[threading.get_ident()] = held

    def _drain(self, held):
        """Block for one request, then sweep stragglers up to max_batch.

        A swept request that would push the wave past max_batch must not
        join this wave (the overshot total lands above every warmed bucket
        and the whole wave stalls on a fresh XLA compile). With replicas it
        goes BACK on the shared queue — any idle chip picks it up (true
        work-stealing); a lone worker keeps it for its own next wave
        (``held``), preserving arrival order. Abandoned (timed-out) items
        are dropped unserved. Returns ``(items, held)``.
        """
        if held is not None:
            first, held = held, None
            self._park(None)
            if first.abandoned:
                first = None
        else:
            first = None
        while first is None:
            try:
                first = self._queue.get(timeout=0.1)
            except queue.Empty:
                return [], None
            if first.abandoned:
                first = None
        items, rows = [first], first.x.shape[0]
        deadline = time.perf_counter() + self.max_wait
        while rows < self.max_batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                nxt = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt.abandoned:
                continue
            if rows + nxt.x.shape[0] > self.max_batch:
                if len(self._workers) > 1:
                    self._queue.put(nxt)  # an idle replica steals it
                else:
                    held = nxt
                    self._park(held)
                break
            items.append(nxt)
            rows += nxt.x.shape[0]
        return items, held

    def _loop(self, predictor, device):
        held = None
        while not self._stop.is_set():
            items, held = self._drain(held)
            # re-check deadlines at wave assembly: a request can time out
            # between being swept off the queue and the device call, and
            # serving it anyway spends a dispatch on a result nobody reads
            # (under sustained deadline pressure that starves live requests)
            items = [it for it in items if not it.abandoned]
            if not items:
                continue
            bucket = 0
            try:
                x = np.concatenate([it.x for it in items], axis=0)
                bucket = self._bucketed(x.shape[0])
                if bucket > x.shape[0]:
                    pad = np.zeros((bucket - x.shape[0],) + x.shape[1:],
                                   x.dtype)
                    x = np.concatenate([x, pad], axis=0)
                with self._device_ctx(device):
                    out = np.asarray(predictor.predict(x))
                off = 0
                for it in items:
                    it.result = out[off : off + it.x.shape[0]]
                    off += it.x.shape[0]
            except Exception as e:  # propagate to every waiter in the batch
                for it in items:
                    it.error = e
            finally:
                with self._stats_lock:
                    self.n_batches += 1
                    self.bucket_counts[bucket] = \
                        self.bucket_counts.get(bucket, 0) + 1
                    if device is not None:
                        k = str(device)
                        self.device_batches[k] = \
                            self.device_batches.get(k, 0) + 1
                for it in items:
                    it.event.set()
        if held is not None:  # drained but never served before shutdown
            self._park(None)
            held.error = RuntimeError("BatchingPredictor closed")
            held.event.set()


def make_handler(batcher: BatchingPredictor, predictor):
    """HTTP handler bound to a batcher (predict) + raw predictor (rollout)."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet; stats live at /stats
            pass

        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                import jax

                self._send(200, {"status": "ok",
                                 "backend": jax.default_backend(),
                                 "n_devices": jax.device_count()})
            elif self.path == "/stats":
                self._send(200, batcher.stats())
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length))
                x = np.asarray(req["inputs"], np.float32)
                if x.ndim != 3:
                    raise ValueError(f"inputs must be (B, T, D), got {x.shape}")
                if self.path == "/predict":
                    out = batcher.predict(x)
                elif self.path == "/predict_autoregressive":
                    out = np.asarray(predictor.predict_autoregressive(
                        x, horizon=int(req["horizon"]),
                        step_window=req.get("step_window")))
                else:
                    self._send(404, {"error": f"unknown path {self.path}"})
                    return
                self._send(200, {"outputs": out.tolist()})
            except Exception as e:
                self._send(400, {"error": f"{type(e).__name__}: {e}"})

    return Handler


class PredictionServer:
    """HTTP wrapper: serve_forever in the caller's thread or background."""

    def __init__(self, predictor, host: str = "127.0.0.1", port: int = 8476,
                 *, max_batch: int = 128, max_wait_ms: float = 2.0,
                 warmup: bool = False, devices=None):
        self.batcher = BatchingPredictor(
            predictor, max_batch=max_batch, max_wait_ms=max_wait_ms,
            devices=devices)
        if warmup:
            m = predictor.model
            in_n = getattr(m, "seq_len", None) or m.in_nTP
            dim = getattr(m, "input_size", None) or m.dimPosIn
            self.batcher.warmup((in_n, dim))
        self.httpd = ThreadingHTTPServer(
            (host, port), make_handler(self.batcher, predictor))
        self.port = self.httpd.server_address[1]

    def serve_forever(self):
        self.httpd.serve_forever()

    def start_background(self) -> threading.Thread:
        t = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        t.start()
        return t

    def close(self):
        self.httpd.shutdown()
        self.httpd.server_close()
        self.batcher.close()


def main(argv: Optional[list] = None) -> None:
    """CLI: serve a checkpoint. Model flags mirror the reference defaults."""
    import argparse

    import jax

    ap = argparse.ArgumentParser(description="Serve a trained model over HTTP "
                                             "with dynamic micro-batching.")
    ap.add_argument("--model_path", required=True,
                    help=".ckpt (native) or .pt (reference torch state_dict)")
    ap.add_argument("--arch", choices=["auto", "conv", "mlp"], default="auto",
                    help="auto rebuilds the architecture from the .ckpt's "
                         "stored training args, falling back to the flags "
                         "below (conv) for .pt / pre-meta checkpoints")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8476)
    ap.add_argument("--max_batch", type=int, default=128)
    ap.add_argument("--max_wait_ms", type=float, default=2.0)
    ap.add_argument("--replicas", type=int, default=0,
                    help="replicate serving across the first N visible "
                         "chips (each with its own parameter copy, pulling "
                         "from the shared request queue); 0 = default "
                         "single device, unpinned; N=1 pins one replica")
    # shape flags (reference CLI defaults, train_mixer_h36m.py:575-595 /
    # train_mixer_amass.py:235-246)
    ap.add_argument("--input_n", type=int, default=10)
    ap.add_argument("--output_n", type=int, default=25)
    ap.add_argument("--pose_dim", type=int, default=66)
    ap.add_argument("--num_blocks", type=int, default=4)
    ap.add_argument("--hidden_dim", type=int, default=50)
    ap.add_argument("--conv_nChan", type=int, default=1)
    ap.add_argument("--kernel_x", type=int, default=1)
    ap.add_argument("--kernel_y", type=int, default=3)
    ap.add_argument("--tokens_mlp_dim", type=int, default=20)
    ap.add_argument("--channels_mlp_dim", type=int, default=128)
    ap.add_argument("--activation", default="mish")
    ap.add_argument("--n_harmonic_functions", type=int, default=64)
    args = ap.parse_args(argv)

    from .serving import Predictor

    model = None
    sample_shape = (1, args.input_n, args.pose_dim)
    if args.arch == "auto":
        from .train.state import load_checkpoint_meta

        meta = (None if args.model_path.endswith((".pt", ".pth"))
                else load_checkpoint_meta(args.model_path))
        if meta:
            from .cli._runner import model_from_checkpoint_meta

            model, sample_shape = model_from_checkpoint_meta(meta)
    arch = args.arch if args.arch != "auto" else "conv"
    if model is not None:
        pass
    elif arch == "conv":
        from .models import ConvMixer

        model = ConvMixer(
            num_blocks=args.num_blocks, dimPosIn=args.pose_dim,
            dimPosEmb=args.hidden_dim, dimPosOut=args.pose_dim,
            in_nTP=args.input_n, out_nTP=args.output_n,
            conv_nChan=args.conv_nChan,
            conv1_kernel_shape=(args.kernel_x, args.kernel_y),
            conv1_stride=(1, 1), conv1_padding=(0, 1), mode_conv="twice",
            activation=args.activation, regularization=0.1, use_se=True,
            r_se=8, encoder_n_harmonic_functions=args.n_harmonic_functions,
            encoder_omega0=0.1,
        )
    else:
        from .models import MlpMixer

        model = MlpMixer(
            num_classes=args.pose_dim, num_blocks=args.num_blocks,
            hidden_dim=args.hidden_dim, tokens_mlp_dim=args.tokens_mlp_dim,
            channels_mlp_dim=args.channels_mlp_dim, seq_len=args.input_n,
            pred_len=args.output_n, activation=args.activation,
            regularization=0.1, input_size=args.pose_dim, r_se=8, use_se=True,
        )
    predictor = Predictor.from_checkpoint(
        model, args.model_path, sample_shape=sample_shape)
    devices = None
    if args.replicas >= 1:
        visible = jax.devices()
        if args.replicas > len(visible):
            raise SystemExit(
                f"--replicas {args.replicas} exceeds the {len(visible)} "
                f"visible devices")
        devices = visible[:args.replicas]
    print("warming up (compiling every batch bucket"
          + (f" on {len(devices)} replicas" if devices else "") + ")...",
          flush=True)
    server = PredictionServer(predictor, args.host, args.port,
                              max_batch=args.max_batch,
                              max_wait_ms=args.max_wait_ms, warmup=True,
                              devices=devices)
    print(f"serving {args.arch} model on http://{args.host}:{server.port} "
          f"(backend={jax.default_backend()}, max_batch={args.max_batch}, "
          f"buckets={server.batcher.buckets}"
          + (f", replicas={len(devices)}" if devices else "") + ")")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.close()


if __name__ == "__main__":
    main()
