"""Native C++ runtime tests: build, aligner policy parity with the Python
implementation, PLY write/read parity with the Python implementation, and
thread-safety of the aligner under concurrent producers."""

import os
import threading

import numpy as np
import pytest

from gaussian_lic_tpu import native
from gaussian_lic_tpu.engine.stream import (
    NativeStreamAligner,
    StreamAligner,
    make_aligner,
)
from gaussian_lic_tpu.io import ply as ply_io

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native runtime not buildable (no g++)"
)


class TestNativeAligner:
    def test_factory_prefers_native(self):
        a = make_aligner()
        assert isinstance(a, NativeStreamAligner)

    def _feed(self, a, events):
        for kind, stamp, payload in events:
            getattr(a, f"push_{kind}")(stamp, payload)

    def _drain(self, a):
        out = []
        for _ in range(100):
            r = a.pop_aligned()
            if r is None:
                # python aligner returns None mid-drop; retry while queues move
                r2 = a.pop_aligned()
                if r2 is None:
                    break
                out.append(r2)
            else:
                out.append(r)
        return out

    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_policy_parity_with_python(self, seed):
        rng = np.random.default_rng(seed)
        events = []
        t = 0.0
        for _ in range(60):
            t += float(rng.uniform(0.001, 0.02))
            kind = ["points", "pose", "image"][int(rng.integers(3))]
            jitter = float(rng.normal(0, 0.004))
            events.append((kind, t + jitter, f"{kind}@{t:.4f}"))
        nat, py = NativeStreamAligner(0.01), StreamAligner(0.01)
        self._feed(nat, events)
        self._feed(py, events)
        got_n = self._drain(nat)
        got_p = self._drain(py)
        assert [g[0] for g in got_n] == [g[0] for g in got_p]
        assert [g[1:] for g in got_n] == [g[1:] for g in got_p]

    def test_exact_triplet(self):
        a = NativeStreamAligner(0.01)
        a.push_points(1.0, "P")
        a.push_pose(1.002, "T")
        a.push_image(0.995, "I")
        stamp, p, t, i = a.pop_aligned()
        assert (p, t, i) == ("P", "T", "I")
        assert abs(stamp - 1.0) < 1e-9

    def test_unmatched_points_dropped(self):
        a = NativeStreamAligner(0.01)
        a.push_points(1.0, "P")
        a.push_pose(2.0, "T")   # too new → the point cloud is unmatched
        a.push_image(1.0, "I")
        assert a.pop_aligned() is None
        assert a.dropped == 1

    def test_concurrent_producers(self):
        a = NativeStreamAligner(0.01)
        n = 200

        def produce(kind):
            for i in range(n):
                getattr(a, f"push_{kind}")(float(i), f"{kind}{i}")

        threads = [
            threading.Thread(target=produce, args=(k,))
            for k in ("points", "pose", "image")
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        got = []
        while True:
            r = a.pop_aligned()
            if r is None:
                break
            got.append(r)
        assert len(got) == n
        for i, (stamp, p, t, im) in enumerate(got):
            assert (p, t, im) == (f"points{i}", f"pose{i}", f"image{i}")


class TestNativePly:
    def _arrays(self, rng, n=500, S=15):
        return dict(
            xyz=rng.normal(size=(n, 3)).astype(np.float32),
            dc=rng.normal(size=(n, 3)).astype(np.float32),
            sh_rest=rng.normal(size=(n, S, 3)).astype(np.float32),
            opa_logit=rng.normal(size=(n,)).astype(np.float32),
            log_scale=rng.normal(size=(n, 3)).astype(np.float32),
            quat=rng.normal(size=(n, 4)).astype(np.float32),
        )

    def test_native_matches_python_bytes(self, tmp_path, rng):
        arrs = self._arrays(rng)
        p_nat = tmp_path / "nat.ply"
        p_py = tmp_path / "py.ply"
        ply_io.save_ply(str(p_nat), **arrs, use_native=True)
        ply_io.save_ply(str(p_py), **arrs, use_native=False)
        assert p_nat.read_bytes() == p_py.read_bytes()

    def test_roundtrip_via_python_reader(self, tmp_path, rng):
        arrs = self._arrays(rng, n=123, S=15)
        p = tmp_path / "m.ply"
        ply_io.save_ply(str(p), **arrs, use_native=True)
        back = ply_io.load_ply(str(p))
        for k in arrs:
            np.testing.assert_allclose(back[k], arrs[k], rtol=0, atol=0)

    def test_native_reader(self, tmp_path, rng):
        import ctypes

        arrs = self._arrays(rng, n=77, S=15)
        p = str(tmp_path / "m.ply")
        ply_io.save_ply(p, **arrs, use_native=True)
        lib = native.get_lib()
        n = ctypes.c_int64()
        S = ctypes.c_int()
        hb = ctypes.c_int64()
        assert lib.glic_ply_read_header(p.encode(), ctypes.byref(n),
                                        ctypes.byref(S), ctypes.byref(hb)) == 0
        assert (n.value, S.value) == (77, 15)
        out = {
            "xyz": np.empty((77, 3), np.float32),
            "dc": np.empty((77, 3), np.float32),
            "sh_rest": np.empty((77, 15, 3), np.float32),
            "opa_logit": np.empty((77,), np.float32),
            "log_scale": np.empty((77, 3), np.float32),
            "quat": np.empty((77, 4), np.float32),
        }
        fp = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        rc = lib.glic_ply_read(
            p.encode(), n.value, S.value, hb.value,
            fp(out["xyz"]), fp(out["dc"]), fp(out["sh_rest"]),
            fp(out["opa_logit"]), fp(out["log_scale"]), fp(out["quat"]),
        )
        assert rc == 0
        for k in arrs:
            np.testing.assert_array_equal(out[k], arrs[k])
