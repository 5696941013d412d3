"""Batching inference server: TPU-native online serving for STR models.

The reference repo has no serving stack (strhub is train/eval only); this
is new TPU-first surface. Design constraints that shape it:

- **Static shapes only.** XLA compiles one executable per input shape, so
  arbitrary request batch sizes would each pay a 20-40 s compile. Requests
  are coalesced into a fixed ladder of batch sizes (powers of two up to
  ``max_batch``) and right-padded; every ladder rung is compiled once
  (optionally ahead of time with ``warmup()``).
- **One dispatcher thread owns the device.** Requests enqueue; the
  dispatcher drains the queue, packs the largest rung that fits (or waits
  up to ``max_wait_ms`` for more work), dispatches asynchronously, and
  hands the in-flight future to a small drain pipeline so host decode of
  batch N-1 overlaps device compute of batch N (same pipelining the eval
  path uses, train/evaluate.py).
- **Host work stays off the device path.** PIL decode + resize/normalize
  run in the caller's thread (preprocess_jax is jitted and cached); the
  dispatcher only stacks ready arrays.

Usage:
    bundle = load_from_checkpoint('model.ckpt')
    srv = InferenceServer(bundle, max_batch=32)
    srv.start()
    text, conf = srv.submit(image_f32_nhwc).result()
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass, field

import numpy as np


def _rungs(max_batch):
    r, b = [], 1
    while b < max_batch:
        r.append(b)
        b *= 2
    r.append(max_batch)
    return r


@dataclass
class _Request:
    image: np.ndarray  # (H, W, 3): uint8 resized (preferred) or f32 normalized
    future: Future = field(default_factory=Future)


class InferenceServer:
    """Coalescing batch server over a registry ModelBundle."""

    def __init__(self, bundle, *, max_batch=32, max_wait_ms=2.0, pipeline_depth=4,
                 drain_threads=4):
        self.bundle = bundle
        self.rungs = _rungs(int(max_batch))
        self.max_wait = float(max_wait_ms) / 1e3
        self.depth = int(pipeline_depth)
        self.n_drainers = int(drain_threads)
        self._q: queue.Queue[_Request] = queue.Queue()
        self._stop = threading.Event()
        self._dispatcher = None
        self._drainers = []
        self._inflight: queue.Queue = queue.Queue()
        self._jitted = self._make_jitted()  # eager wrapper (compiles lazily):
        # no lazy-init race between warmup() and the dispatcher thread
        self.stats = {'batches': 0, 'requests': 0, 'padded': 0}

    # -- public API ---------------------------------------------------------

    def start(self):
        self._dispatcher = threading.Thread(target=self._dispatch_loop,
                                            name='serve-dispatch', daemon=True)
        # A pool of drain threads: each result fetch pays a device->host
        # round trip (on the axon relay, a long one that also forces the
        # execution), so serial draining caps batch rate at 1/RTT —
        # overlapped fetches pipeline on the device side instead.
        self._drainers = [threading.Thread(target=self._drain_loop,
                                           name=f'serve-drain-{i}', daemon=True)
                          for i in range(self.n_drainers)]
        self._dispatcher.start()
        for t in self._drainers:
            t.start()
        return self

    def stop(self):
        self._stop.set()
        for t in [self._dispatcher, *self._drainers]:
            if t is not None:
                t.join(timeout=10)

    def warmup(self, rungs=None):
        """Compile every ladder rung ahead of serving (first-request latency).
        Blocks until each rung's executable has actually run to completion —
        async-dispatched warmups would otherwise drain underneath the first
        real requests. Call BEFORE exposing the server to traffic (the CLI
        does): warmup dispatches from the calling thread, which is only safe
        while the dispatcher is idle."""
        h, w = self.bundle.img_size
        for b in rungs or self.rungs:
            # uint8 is the production request dtype (4x less relay upload;
            # normalize runs on device). f32 submissions compile lazily.
            ids, conf = self._forward(np.zeros((b, h, w, 3), np.uint8))
            np.asarray(conf)  # forced fetch (relay executes on fetch)

    def submit(self, image: np.ndarray) -> Future:
        """image: (H, W, 3) — uint8 resized (normalize runs on device; 4x
        less host->device traffic) or float32 already normalized.
        Returns Future[(str, float)]."""
        image = np.asarray(image)
        if image.dtype != np.uint8:
            image = np.asarray(image, np.float32)
        req = _Request(image)
        if self._stop.is_set():
            req.future.set_exception(RuntimeError('InferenceServer stopped'))
            return req.future
        self._q.put(req)
        return req.future

    def read_files(self, paths):
        """Convenience: decode + preprocess + submit; returns results.

        JPEGs go through the native decode+resize (bit-identical to the
        PIL path, data/native/jpeg_decode.cpp); everything else via PIL."""
        from parseq_tpu.data.native import jpeg_decode_resize

        futures = []
        for p in paths:
            arr = None
            with open(p, 'rb') as f:
                data = f.read()
            arr = jpeg_decode_resize(data, self.bundle.img_size)
            if arr is None:
                import io

                from PIL import Image

                from parseq_tpu.data.transforms import preprocess_pil_u8

                with Image.open(io.BytesIO(data)) as img:
                    arr = preprocess_pil_u8(img, self.bundle.img_size)
            futures.append(self.submit(arr))
        return [f.result() for f in futures]

    # -- internals ----------------------------------------------------------

    def _make_jitted(self):
        import jax

        from parseq_tpu.train.evaluate import _device_post

        fwd = self.bundle.forward_fn

        def fused(params, images):
            if images.dtype == jax.numpy.uint8:
                # same op order as transforms.preprocess_pil (1-ulp parity)
                images = (images.astype(jax.numpy.float32) / 255.0 - 0.5) / 0.5
            return _device_post(fwd(params, images))

        return jax.jit(fused)

    def _forward(self, batch_np):
        """One fused dispatch: forward + device-side softmax/argmax/gather.

        The drain thread then only FETCHES (ids, conf) — ~100x smaller than
        the logits tensor and, crucially, issues no second device dispatch
        from another thread (the dispatcher thread owns all dispatches)."""
        import jax

        return self._jitted(self.bundle.params, jax.numpy.asarray(batch_np))

    def _dispatch_loop(self):
        import time

        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.05)
            except queue.Empty:
                continue
            reqs = [first]
            deadline = time.monotonic() + self.max_wait
            # coalesce until the biggest rung is full or the wait budget ends
            while len(reqs) < self.rungs[-1]:
                remaining = deadline - time.monotonic()
                if remaining <= 0 and len(reqs) >= 1:
                    break
                try:
                    reqs.append(self._q.get(timeout=max(remaining, 0)))
                except queue.Empty:
                    break
            try:
                rung = next(r for r in self.rungs if r >= len(reqs))
                h, w = self.bundle.img_size
                # one dtype per batch: uint8 unless a legacy f32 request is
                # present (then u8 members are normalized on host)
                u8 = all(r.image.dtype == np.uint8 for r in reqs)
                batch = np.zeros((rung, h, w, 3), np.uint8 if u8 else np.float32)
                for i, r in enumerate(reqs):
                    im = r.image  # raises on wrong-shape submissions
                    if not u8 and im.dtype == np.uint8:
                        im = (im.astype(np.float32) / 255.0 - 0.5) / 0.5
                    batch[i] = im
                out = self._forward(batch)  # async dispatch (device ids+conf)
            except Exception as e:  # noqa: BLE001 - fail THESE requests, keep serving
                for r in reqs:
                    if not r.future.done():
                        r.future.set_exception(e)
                continue
            self.stats['batches'] += 1
            self.stats['requests'] += len(reqs)
            self.stats['padded'] += rung - len(reqs)
            self._inflight.put((out, reqs))
            while self._inflight.qsize() >= self.depth and not self._stop.is_set():
                time.sleep(0.0005)
        # shutdown: fail anything still queued so no caller deadlocks on a
        # Future that will never resolve
        while True:
            try:
                req = self._q.get_nowait()
            except queue.Empty:
                break
            if not req.future.done():
                req.future.set_exception(RuntimeError('InferenceServer stopped'))

    def _drain_loop(self, fetch_group=8):
        """Resolve in-flight batches. Each host fetch costs a device->host
        round trip (which on the axon relay also forces the execution), so
        up to ``fetch_group`` same-shape batches are concatenated on device
        and fetched together — one round trip resolves the whole group."""
        import jax.numpy as jnp

        while not (self._stop.is_set() and self._inflight.empty()):
            try:
                group = [self._inflight.get(timeout=0.05)]
            except queue.Empty:
                continue
            shape = group[0][0][0].shape
            while len(group) < fetch_group:
                try:
                    nxt = self._inflight.get_nowait()
                except queue.Empty:
                    break
                if nxt[0][0].shape != shape:
                    self._inflight.put(nxt)  # different rung; next round
                    break
                group.append(nxt)
            try:
                if len(group) == 1:
                    all_ids = np.asarray(group[0][0][0])
                    all_conf = np.asarray(group[0][0][1])
                else:
                    all_ids = np.asarray(jnp.concatenate([g[0][0] for g in group]))
                    all_conf = np.asarray(jnp.concatenate([g[0][1] for g in group]))
                off = 0
                for (_, reqs) in group:
                    preds, tok_probs = self.bundle.tokenizer.decode_ids(
                        all_ids[off: off + len(reqs)], all_conf[off: off + len(reqs)])
                    for r, text, p in zip(reqs, preds, tok_probs):
                        r.future.set_result((text, float(np.prod(p))))
                    off += shape[0]
            except Exception as e:  # noqa: BLE001 - fail the group, keep serving
                for (_, reqs) in group:
                    for r in reqs:
                        if not r.future.done():
                            r.future.set_exception(e)
