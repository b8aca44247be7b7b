"""Serving layer: micro-batching, shape bucketing, padding, HTTP front-end.

The service pins one (grid, batch, chunk) executable per size bucket and
pads under-full batches — deployment surface the reference never had
(its eval loop is a bare script, /root/reference/evaluate.py)."""

import json
import urllib.request

import numpy as np
import pytest

from helmnet_tpu.serve import ServeConfig, SolverService
from helmnet_tpu.solvers.iterative import IterativeSolver
from tests.test_training import tiny_config


def make_service(**kw):
    cfg = ServeConfig(
        max_batch=kw.pop("max_batch", 4),
        chunk_iterations=kw.pop("chunk_iterations", 8),
        default_iterations=kw.pop("default_iterations", 16),
        **kw,
    )
    return SolverService(IterativeSolver(tiny_config()), cfg)


class TestSolverService:
    def test_solve_matches_direct_forward(self):
        """A served solve returns exactly what a direct forward returns
        (same params, same source, same iteration count)."""
        service = make_service()
        rng = np.random.default_rng(0)
        sos = 1.0 + 0.5 * rng.random((32, 32)).astype(np.float32)
        try:
            out = service.solve(sos, iterations=16)
            solver = IterativeSolver(tiny_config())
            ref = solver.forward(sos[None], num_iterations=16,
                                 chunk_iterations=8)
            np.testing.assert_allclose(
                out["wavefield"], np.asarray(ref["wavefield"])[0], atol=1e-5
            )
            np.testing.assert_allclose(
                out["rmse"], np.asarray(ref["rmse"])[:, 0], rtol=1e-4
            )
            assert out["iterations"] == 16
        finally:
            service.shutdown()

    def test_batching_and_padding(self):
        """Concurrent same-shape requests coalesce into one padded batch and
        each slot returns exactly its own per-sample answer (checked against
        independent direct forwards with the same per-request sources)."""
        service = make_service(batch_window_s=0.2)
        rng = np.random.default_rng(1)
        sos = 1.0 + 0.5 * rng.random((32, 32)).astype(np.float32)
        locs = [(20, 16), (22, 16), (24, 18)]
        try:
            futs = [
                service.submit(sos, source_location=loc, iterations=8)
                for loc in locs
            ]
            outs = [f.result(timeout=300) for f in futs]
            solver = IterativeSolver(tiny_config())
            for loc, out in zip(locs, outs):
                solver.set_sources([loc])
                ref = solver.forward(sos[None], num_iterations=8,
                                     chunk_iterations=8)
                np.testing.assert_allclose(
                    out["rmse"], np.asarray(ref["rmse"])[:, 0], rtol=1e-4
                )
                np.testing.assert_allclose(
                    out["wavefield"], np.asarray(ref["wavefield"])[0],
                    atol=1e-5,
                )
            stats = service.stats()
            assert stats["completed"] == 3
            # 3 requests in a max_batch=4 bucket: 1 batch, 1 padded slot —
            # unless the window split them (allowed but should be rare)
            assert stats["batches"] <= 2
            assert stats["padded_slots"] >= 1
        finally:
            service.shutdown()

    def test_iteration_rounding(self):
        """Requested iterations round UP to a chunk multiple (the executable
        is fixed-length; correctness over exactness)."""
        service = make_service()
        try:
            out = service.solve(np.ones((32, 32), np.float32), iterations=9)
            assert out["iterations"] == 16  # ceil(9/8)*8
            assert out["rmse"].shape == (16,)
        finally:
            service.shutdown()

    def test_validation_fails_fast(self):
        service = make_service()
        try:
            with pytest.raises(ValueError, match="divisible"):
                service.submit(np.ones((30, 30), np.float32))
            with pytest.raises(ValueError, match="source_map"):
                service.submit(np.ones((32, 32), np.float32),
                               source_map=np.zeros((16, 16)))
            with pytest.raises(ValueError, match="sos_map"):
                service.submit(np.ones((4, 32, 32), np.float32))
        finally:
            service.shutdown()

    def test_shape_buckets(self):
        """Mixed-size traffic lands in different buckets; both complete."""
        service = make_service(batch_window_s=0.05)
        try:
            f32 = service.submit(np.ones((32, 32), np.float32), iterations=8)
            f48 = service.submit(np.ones((48, 48), np.float32), iterations=8)
            o32, o48 = f32.result(timeout=600), f48.result(timeout=600)
            assert o32["wavefield"].shape == (32, 32, 2)
            assert o48["wavefield"].shape == (48, 48, 2)
            assert set(service.stats()["by_size"]) == {"32x32", "48x48"}
        finally:
            service.shutdown()

    def test_shutdown_rejects_new_work(self):
        service = make_service()
        service.shutdown()
        with pytest.raises(RuntimeError):
            service.submit(np.ones((32, 32), np.float32))


class TestHTTPFrontend:
    def test_solve_over_http(self):
        from helmnet_tpu.cli.serve import serve_forever

        service = make_service()
        server, _ = serve_forever(service, port=0)
        port = server.server_address[1]
        try:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30
            ) as r:
                assert json.load(r)["ok"] is True

            body = json.dumps(
                {
                    "sos": np.ones((32, 32), np.float32).tolist(),
                    "source_location": [26, 16],
                    "iterations": 8,
                }
            ).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/solve", data=body,
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=600) as r:
                out = json.load(r)
            wf = np.asarray(out["wavefield"], np.float32)
            assert wf.shape == (32, 32, 2)
            assert np.isfinite(wf).all()
            assert out["best_rmse"] > 0

            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/stats", timeout=30
            ) as r:
                assert json.load(r)["completed"] == 1
        finally:
            server.shutdown()
            service.shutdown()

    def test_http_bad_request(self):
        from helmnet_tpu.cli.serve import serve_forever

        service = make_service()
        server, _ = serve_forever(service, port=0)
        port = server.server_address[1]
        try:
            body = json.dumps({"sos": np.ones((30, 30)).tolist()}).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/solve", data=body
            )
            with pytest.raises(urllib.error.HTTPError) as exc_info:
                urllib.request.urlopen(req, timeout=60)
            assert exc_info.value.code == 400
        finally:
            server.shutdown()
            service.shutdown()
