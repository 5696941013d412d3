"""Online STR serving CLI: HTTP front over the batching InferenceServer.

New TPU-native surface (the reference is train/eval only). Stdlib-only:

    python -m parseq_tpu.cli.serve <checkpoint> [--port 8500] \
        [--max_batch 32] [--max_wait_ms 2.0] [--int8] [model_args...]

Endpoints:
    GET  /healthz          -> {"ok": true, "stats": {...}}
    POST /v1/read          body = image bytes (JPEG/PNG/...)
                           -> {"text": ..., "confidence": ...}

Concurrent requests are coalesced into power-of-two batches and served from
one compiled executable per batch rung (see serve/server.py).
"""

from __future__ import annotations

import argparse
import io
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from parseq_tpu.utils.config import parse_model_args
from parseq_tpu.utils.registry import load_from_checkpoint


def make_handler(server, bundle):
    from PIL import Image

    from parseq_tpu.data.transforms import preprocess_pil_u8

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header('Content-Type', 'application/json')
            self.send_header('Content-Length', str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == '/healthz':
                self._json(200, {'ok': True, 'stats': server.stats})
            else:
                self._json(404, {'error': 'unknown path'})

        def do_POST(self):
            if self.path != '/v1/read':
                self._json(404, {'error': 'unknown path'})
                return
            try:
                n = int(self.headers.get('Content-Length', 0))
                data = self.rfile.read(n)
                # JPEG: native decode+resize (bit-identical to the PIL path,
                # data/native/jpeg_decode.cpp); anything else via PIL.
                from parseq_tpu.data.native import jpeg_decode_resize

                arr = jpeg_decode_resize(data, bundle.img_size)
                if arr is None:
                    img = Image.open(io.BytesIO(data))
                    arr = preprocess_pil_u8(img, bundle.img_size)
            except Exception as e:  # noqa: BLE001 - bad input -> client error
                self._json(400, {'error': f'{type(e).__name__}: {e}'})
                return
            try:
                text, conf = server.submit(arr).result(timeout=30)
                self._json(200, {'text': text, 'confidence': conf})
            except TimeoutError:
                self._json(504, {'error': 'inference timed out (server overloaded)'})
            except Exception as e:  # noqa: BLE001 - server-side failure
                self._json(500, {'error': f'{type(e).__name__}: {e}'})

    return Handler


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('checkpoint')
    ap.add_argument('--port', type=int, default=8500)
    ap.add_argument('--host', default='127.0.0.1')
    ap.add_argument('--max_batch', type=int, default=32)
    ap.add_argument('--max_wait_ms', type=float, default=2.0)
    ap.add_argument('--int8', action='store_true')
    ap.add_argument('--no_warmup', action='store_true')
    ap.add_argument('model_args', nargs='*')
    args = ap.parse_args(argv)

    bundle = load_from_checkpoint(args.checkpoint, **parse_model_args(args.model_args))
    if args.int8:
        from parseq_tpu.ops.quant import quantize_bundle

        bundle = quantize_bundle(bundle)

    from parseq_tpu.serve import InferenceServer

    srv = InferenceServer(bundle, max_batch=args.max_batch,
                          max_wait_ms=args.max_wait_ms).start()
    if not args.no_warmup:
        print(f'warming up rungs {srv.rungs} ...', flush=True)
        srv.warmup()
    httpd = ThreadingHTTPServer((args.host, args.port), make_handler(srv, bundle))
    print(f'serving {bundle.name} on http://{args.host}:{args.port} '
          f'(rungs {srv.rungs}, wait {args.max_wait_ms} ms)', flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.stop()


if __name__ == '__main__':
    main()
