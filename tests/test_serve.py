"""Batching inference server (serve/) + HTTP CLI: coalescing, results, stats."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest

import jax.numpy as jnp

from parseq_tpu.serve import InferenceServer
from parseq_tpu.utils.registry import create_model


@pytest.fixture(scope='module')
def bundle():
    return create_model('parseq', dtype=jnp.float32, max_label_length=5,
                        img_size=[16, 32], enc_depth=1, embed_dim=32,
                        enc_num_heads=2, dec_num_heads=4)


def test_rung_ladder():
    from parseq_tpu.serve.server import _rungs

    assert _rungs(32) == [1, 2, 4, 8, 16, 32]
    assert _rungs(12) == [1, 2, 4, 8, 12]
    assert _rungs(1) == [1]


def test_submit_batch_and_results(bundle):
    srv = InferenceServer(bundle, max_batch=8, max_wait_ms=30.0).start()
    try:
        imgs = [np.random.default_rng(i).uniform(-1, 1, (16, 32, 3)).astype(np.float32)
                for i in range(5)]
        futures = [srv.submit(im) for im in imgs]
        results = [f.result(timeout=120) for f in futures]
        assert len(results) == 5
        for text, conf in results:
            assert isinstance(text, str) and 0.0 <= conf <= 1.0
        # same image twice -> same answer (determinism through the batcher)
        f1 = srv.submit(imgs[0]).result(timeout=60)
        f2 = srv.submit(imgs[0]).result(timeout=60)
        assert f1[0] == f2[0]
        assert srv.stats['requests'] >= 7
        # coalescing actually happened: fewer batches than requests
        assert srv.stats['batches'] < srv.stats['requests']
    finally:
        srv.stop()


def test_results_match_direct_read(bundle):
    srv = InferenceServer(bundle, max_batch=4, max_wait_ms=5.0).start()
    try:
        img = np.random.default_rng(7).uniform(-1, 1, (16, 32, 3)).astype(np.float32)
        direct_labels, direct_conf = bundle.read(img[None])
        text, conf = srv.submit(img).result(timeout=120)
        assert text == direct_labels[0]
        assert abs(conf - direct_conf[0]) < 1e-4
    finally:
        srv.stop()


def test_http_cli_end_to_end(bundle, tmp_path):
    """Full stack: serve CLI handler over a live localhost HTTP server."""
    from http.server import ThreadingHTTPServer
    from PIL import Image

    from parseq_tpu.cli.serve import make_handler

    srv = InferenceServer(bundle, max_batch=4, max_wait_ms=2.0).start()
    httpd = ThreadingHTTPServer(('127.0.0.1', 0), make_handler(srv, bundle))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f'http://127.0.0.1:{port}/healthz') as r:
            assert json.load(r)['ok'] is True

        img = Image.fromarray(
            np.random.default_rng(0).integers(0, 255, (20, 50, 3), np.uint8).astype(np.uint8))
        buf = io.BytesIO()
        img.save(buf, format='PNG')
        req = urllib.request.Request(f'http://127.0.0.1:{port}/v1/read',
                                     data=buf.getvalue(), method='POST')
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.load(r)
        assert 'text' in out and 'confidence' in out
    finally:
        httpd.shutdown()
        srv.stop()


def test_stop_fails_pending_and_rejects_new(bundle):
    srv = InferenceServer(bundle, max_batch=4, max_wait_ms=1.0).start()
    srv.stop()
    f = srv.submit(np.zeros((16, 32, 3), np.float32))
    with pytest.raises(RuntimeError, match='stopped'):
        f.result(timeout=10)


def test_wrong_shape_submission_fails_only_that_request(bundle):
    srv = InferenceServer(bundle, max_batch=4, max_wait_ms=1.0).start()
    try:
        bad = srv.submit(np.zeros((99, 99, 3), np.float32))
        with pytest.raises(Exception):
            bad.result(timeout=60)
        # server still serves well-formed requests afterwards
        good = srv.submit(np.zeros((16, 32, 3), np.float32))
        text, conf = good.result(timeout=60)
        assert isinstance(text, str)
    finally:
        srv.stop()
