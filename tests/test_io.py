"""IO round trips: .sens container, TUM loader."""

import os

import numpy as np

from voxelhashing_tpu.config import CameraConfig
from voxelhashing_tpu.io import sensfile, tum
from voxelhashing_tpu.io.synthetic import Scene, make_sequence


CAM = CameraConfig(width=64, height=48, fx=52.0, fy=52.0, cx=31.5, cy=23.5)


def make_data(n=3):
    return make_sequence(n, CAM, Scene())


class TestSensRoundTrip:
    def _roundtrip(self, tmp_path, compress):
        depths, colors, poses = make_data()
        path = os.path.join(tmp_path, "seq.sens")
        intr = np.eye(4, dtype=np.float32)
        intr[0, 0], intr[1, 1] = CAM.fx, CAM.fy
        intr[0, 2], intr[1, 2] = CAM.cx, CAM.cy
        sensfile.write_sens(path, depths, colors, poses, intr,
                            compress_depth=compress)
        r = sensfile.SensReader(path)
        assert len(r) == len(poses)
        assert r.header.depth_width == CAM.width
        np.testing.assert_allclose(
            r.header.calibration_depth.intrinsic[0, 0], CAM.fx)
        for i in range(len(r)):
            d, c, p = r.read_frame(i)
            np.testing.assert_allclose(p, poses[i], atol=1e-6)
            valid = np.isfinite(depths[i])
            np.testing.assert_allclose(d[valid], depths[i][valid], atol=1e-3)
            assert np.all(~np.isfinite(d[~valid]))
            np.testing.assert_allclose(c, colors[i], atol=1 / 255.0)
        gt = r.ground_truth()
        np.testing.assert_allclose(gt[2], poses[2], atol=1e-6)
        r.close()

    def test_zlib_depth(self, tmp_path):
        self._roundtrip(tmp_path, compress=True)

    def test_raw_depth(self, tmp_path):
        self._roundtrip(tmp_path, compress=False)

    def test_occi_codec_roundtrip(self):
        """OCCI bitstream grammar: all token classes exercised."""
        rng = np.random.default_rng(0)
        # runs, +/-1 steps, +/-2 steps, resets — u16 values < 2048
        vals = np.concatenate([
            np.zeros(20, np.uint16),
            np.full(7, 100, np.uint16),
            100 + np.cumsum(rng.integers(-2, 3, 50)).clip(0, 2047),
            rng.integers(0, 2048, 30),
            np.full(40, 1234, np.uint16),
        ]).astype(np.uint16)
        buf = sensfile.occi_encode(vals)
        out = sensfile.occi_decode(buf, len(vals))
        np.testing.assert_array_equal(out, vals)
        # real runs compress: a smooth frame beats raw by a lot
        smooth = np.full(4096, 777, np.uint16)
        assert len(sensfile.occi_encode(smooth)) < 4096 * 2 // 8

    def test_occi_depth_file(self, tmp_path):
        """A .sens written with the OCCI depth codec replays correctly
        (sensorData.h:1027-1028 makes OCCI the reference's default)."""
        depths, colors, poses = make_data()
        path = os.path.join(tmp_path, "seq_occi.sens")
        intr = np.eye(4, dtype=np.float32)
        # shift 256/m keeps mm-scale depth < 2048 for the 11-bit resets
        sensfile.write_sens(path, depths, colors, poses, intr,
                            depth_shift=256.0,
                            depth_codec=sensfile.DEPTH_OCCI)
        r = sensfile.SensReader(path)
        assert r.header.depth_compression == sensfile.DEPTH_OCCI
        d, c, p = r.read_frame(1)
        valid = np.isfinite(depths[1])
        np.testing.assert_allclose(d[valid], depths[1][valid],
                                   atol=0.5 / 256.0 + 1e-6)
        r.close()

    def test_chain_reader(self, tmp_path):
        """Two .sens files replay as one sequence (loadNextSensFile)."""
        depths, colors, poses = make_sequence(5, CAM, Scene())
        intr = np.eye(4, dtype=np.float32)
        p1 = os.path.join(tmp_path, "a.sens")
        p2 = os.path.join(tmp_path, "b.sens")
        sensfile.write_sens(p1, depths[:2], colors[:2], poses[:2], intr)
        sensfile.write_sens(p2, depths[2:], colors[2:], poses[2:], intr)
        chain = sensfile.SensChainReader([p1, p2])
        assert len(chain) == 5
        for i in (0, 2, 4):
            d, c, p = chain.read_frame(i)
            np.testing.assert_allclose(p, poses[i], atol=1e-6)
            valid = np.isfinite(depths[i])
            np.testing.assert_allclose(d[valid], depths[i][valid], atol=1e-3)
        assert len(chain.ground_truth()) == 5
        assert len(list(chain.frames())) == 5
        chain.close()


class TestTum:
    def _make_tum_dir(self, tmp_path):
        from PIL import Image
        depths, colors, poses = make_data(3)
        root = str(tmp_path)
        os.makedirs(os.path.join(root, "depth"))
        os.makedirs(os.path.join(root, "rgb"))
        with open(os.path.join(root, "depth.txt"), "w") as fd, \
                open(os.path.join(root, "rgb.txt"), "w") as fr, \
                open(os.path.join(root, "groundtruth.txt"), "w") as fg:
            fg.write("# ground truth\n")
            for i in range(3):
                t = 100.0 + i * 0.033
                du = np.where(np.isfinite(depths[i]),
                              depths[i] * 5000.0, 0).astype(np.uint16)
                Image.fromarray(du).save(
                    os.path.join(root, f"depth/{i}.png"))
                Image.fromarray((colors[i] * 255).astype(np.uint8)).save(
                    os.path.join(root, f"rgb/{i}.png"))
                fd.write(f"{t} depth/{i}.png\n")
                fr.write(f"{t + 0.001} rgb/{i}.png\n")
                # pose -> quaternion
                p = poses[i]
                from voxelhashing_tpu.io.tum import quat_to_matrix
                # extract quaternion w >= 0 from rotation matrix
                r = p[:3, :3]
                qw = np.sqrt(max(0.0, 1 + r[0, 0] + r[1, 1] + r[2, 2])) / 2
                qx = (r[2, 1] - r[1, 2]) / (4 * qw)
                qy = (r[0, 2] - r[2, 0]) / (4 * qw)
                qz = (r[1, 0] - r[0, 1]) / (4 * qw)
                fg.write(f"{t} {p[0,3]} {p[1,3]} {p[2,3]} "
                         f"{qx} {qy} {qz} {qw}\n")
        return root, depths, colors, poses

    def test_load_and_read(self, tmp_path):
        root, depths, colors, poses = self._make_tum_dir(tmp_path)
        seq = tum.load_tum(root, camera=CAM)
        assert len(seq) == 3
        d, c, p = seq.read_frame(1)
        valid = np.isfinite(depths[1])
        np.testing.assert_allclose(d[valid], depths[1][valid], atol=1e-3)
        np.testing.assert_allclose(c, colors[1], atol=1 / 255.0)
        np.testing.assert_allclose(p, poses[1], atol=1e-5)

    def test_tum_to_sens_converter(self, tmp_path):
        """TUM directory -> .sens -> replay matches direct TUM reads, so
        real datasets flow through the same path the reference uses."""
        root, depths, colors, poses = self._make_tum_dir(tmp_path)
        out = os.path.join(root, "seq.sens")
        n = sensfile.tum_to_sens(root, out)
        assert n == 3
        r = sensfile.SensReader(out)
        assert r.header.sensor_name == "tum"
        d, c, p = r.read_frame(1)
        valid = np.isfinite(depths[1])
        np.testing.assert_allclose(d[valid], depths[1][valid], atol=2e-3)
        np.testing.assert_allclose(p, poses[1], atol=1e-5)
        r.close()

    def test_quat_identity(self):
        np.testing.assert_allclose(tum.quat_to_matrix(0, 0, 0, 1), np.eye(3),
                                   atol=1e-7)

    def test_associate(self):
        a = [(1.0, "a"), (2.0, "b")]
        b = [(1.005, "x"), (3.0, "y")]
        pairs = tum.associate(a, b, max_dt=0.02)
        assert pairs == [(0, 0)]


class TestNetworkSensor:
    def test_stream_roundtrip(self):
        import threading
        from voxelhashing_tpu.io.network import (NetworkSensor,
                                                 RGBDStreamServer)
        depths, colors, poses = make_data(2)
        server = RGBDStreamServer()
        got = {}

        def serve():
            server.accept(timeout=10)
            for i in range(2):
                server.send_frame(depths[i], colors[i], poses[i])
            server.close()

        t = threading.Thread(target=serve)
        t.start()
        sensor = NetworkSensor("127.0.0.1", server.port)
        frames = []
        for i in range(2):
            frames.append(sensor.read_frame())
        sensor.close()
        t.join()
        for i, (d, c, p) in enumerate(frames):
            valid = np.isfinite(depths[i])
            np.testing.assert_allclose(d[valid], depths[i][valid], atol=1e-3)
            assert np.all(~np.isfinite(d[~valid]))
            np.testing.assert_allclose(c, colors[i], atol=1 / 255.0)
            np.testing.assert_allclose(p, poses[i], atol=1e-6)

    def test_depth_only_frame(self):
        import threading
        from voxelhashing_tpu.io.network import (NetworkSensor,
                                                 RGBDStreamServer)
        depths, _, _ = make_data(1)
        server = RGBDStreamServer()

        def serve():
            server.accept(timeout=10)
            server.send_frame(depths[0])
            server.close()

        t = threading.Thread(target=serve)
        t.start()
        sensor = NetworkSensor("127.0.0.1", server.port)
        d, c, p = sensor.read_frame()
        sensor.close()
        t.join()
        assert c is None and p is None
        valid = np.isfinite(depths[0])
        np.testing.assert_allclose(d[valid], depths[0][valid], atol=1e-3)


class TestColorCalibration:
    """Depth -> color-space remap (CUDARGBDSensor.cpp:200-217 analog)."""

    def _intr(self, fx, fy, cx, cy):
        m = np.eye(4, dtype=np.float32)
        m[0, 0], m[1, 1], m[0, 2], m[1, 2] = fx, fy, cx, cy
        return m

    def test_pure_translation_plane(self):
        from voxelhashing_tpu.ops.image import remap_depth_to_color
        h, w = 60, 80
        depth = np.full((h, w), 2.0, np.float32)
        di = self._intr(100.0, 100.0, 39.5, 29.5)
        ci = self._intr(100.0, 100.0, 39.5, 29.5)
        # color camera 4 cm to the right: x_color = x_depth - 0.04
        ce = np.eye(4, dtype=np.float32)
        ce[0, 3] = 0.04
        out = remap_depth_to_color(depth, di, ci, w, h,
                                   depth_extr=None, color_extr=ce)
        # a fronto-parallel plane keeps its z under pure translation
        mapped = np.isfinite(out)
        assert mapped.mean() > 0.9
        assert np.allclose(out[mapped], 2.0, atol=1e-4)
        # the 0.04 m baseline at z=2 shifts the image by fx*0.04/2 = 2 px:
        # the right edge of the color frame receives nothing
        assert not np.isfinite(out[:, :1]).any() or \
            not np.isfinite(out[:, -1:]).any()

    def test_discontinuity_filtered(self):
        from voxelhashing_tpu.ops.image import remap_depth_to_color
        h, w = 40, 40
        depth = np.full((h, w), 1.0, np.float32)
        depth[:, 20:] = 3.0            # step edge
        di = ci = self._intr(50.0, 50.0, 19.5, 19.5)
        out = remap_depth_to_color(depth, di, ci, w, h)
        # edge pixels (3x3 spread 2 m >> thresholds) are dropped before
        # splatting, so no pixel can hold a smeared intermediate depth —
        # the property the reference's stretched-triangle kill provides
        assert np.allclose(out[:, :17][np.isfinite(out[:, :17])], 1.0,
                           atol=1e-4)
        assert np.allclose(out[:, 23:][np.isfinite(out[:, 23:])], 3.0,
                           atol=1e-4)
        fin = out[np.isfinite(out)]
        assert not ((fin > 1.2) & (fin < 2.8)).any()

    def test_sens_source_cam_gate(self, tmp_path):
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "run_slam_mod", "scripts/run_slam.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        from voxelhashing_tpu.config import CameraConfig
        from voxelhashing_tpu.io.sensfile import (SensCalibration,
                                                  SensHeader)
        base = CameraConfig()
        di = self._intr(525.0, 525.0, 319.5, 239.5)
        same = SensHeader("x", SensCalibration(di, np.eye(4, dtype=np.float32)),
                          SensCalibration(di, np.eye(4, dtype=np.float32)),
                          0, 0, 640, 480, 640, 480, 1000.0, 1)
        cam, need = mod._sens_source_cam(same, base)
        assert not need and cam.width == 640 and abs(cam.fx - 525.0) < 1e-5
        ci = self._intr(530.0, 530.0, 319.5, 239.5)
        diff = SensHeader("x", SensCalibration(ci, np.eye(4, dtype=np.float32)),
                          SensCalibration(di, np.eye(4, dtype=np.float32)),
                          0, 0, 640, 480, 640, 480, 1000.0, 1)
        cam, need = mod._sens_source_cam(diff, base)
        assert need and abs(cam.fx - 530.0) < 1e-5


class TestNativeOcciAndPrefetch:
    def test_native_python_occi_bit_identical(self):
        """The C++ OCCI codec (native/voxelhash_host.cpp) and the pure-
        Python fallback must produce bit-identical streams and decodes."""
        import pytest
        from voxelhashing_tpu import native
        if not native.available():
            pytest.skip("native toolchain unavailable")
        rng = np.random.default_rng(3)
        vals = np.concatenate([
            np.full(300, 1234), np.arange(100, 400), np.arange(400, 100, -2),
            rng.integers(0, 2048, 4000), np.zeros(50, np.int64),
        ]).astype(np.uint16)
        buf_n = native.occi_encode(vals)
        out_n = native.occi_decode(buf_n, len(vals))
        # force the python paths
        orig = native.occi_encode, native.occi_decode
        try:
            native.occi_encode = lambda *a: None
            native.occi_decode = lambda *a: None
            buf_p = sensfile.occi_encode(vals)
            out_p = sensfile.occi_decode(buf_p, len(vals))
        finally:
            native.occi_encode, native.occi_decode = orig
        assert buf_n == buf_p
        np.testing.assert_array_equal(out_n, out_p)
        np.testing.assert_array_equal(out_n, vals)

    def test_prefetch_reader_order_and_gt(self, tmp_path):
        """PrefetchReader (RGBDFrameCacheRead analog): frames arrive in
        order with identical contents; ground truth snapshot matches."""
        depths, colors, poses = make_data()
        path = os.path.join(tmp_path, "seq_pf.sens")
        sensfile.write_sens(path, depths, colors, poses,
                            np.eye(4, dtype=np.float32))
        base = sensfile.SensReader(path)
        ref = [base.read_frame(i) for i in range(len(base))]
        pf = sensfile.PrefetchReader(sensfile.SensReader(path), depth=2)
        got = list(pf.frames())
        assert len(got) == len(ref)
        for (d0, c0, p0), (d1, c1, p1) in zip(ref, got):
            np.testing.assert_array_equal(
                np.nan_to_num(d0, nan=-1.0), np.nan_to_num(d1, nan=-1.0))
            np.testing.assert_array_equal(p0, p1)
        np.testing.assert_allclose(pf.ground_truth()[1], poses[1], atol=1e-6)
        pf.close()
        base.close()

    def test_prefetch_reader_early_close(self, tmp_path):
        depths, colors, poses = make_data()
        path = os.path.join(tmp_path, "seq_pf2.sens")
        sensfile.write_sens(path, depths, colors, poses,
                            np.eye(4, dtype=np.float32))
        pf = sensfile.PrefetchReader(sensfile.SensReader(path), depth=1)
        it = pf.frames()
        next(it)
        pf.close()   # must not hang with the worker blocked on a full queue


def test_binarydump_roundtrip(tmp_path):
    """mLib .sensor wire format (BinaryDumpReader analog): write -> read
    bit-exact, trajectory + intrinsics preserved, MINF invalids -> NaN."""
    import numpy as np
    from voxelhashing_tpu.config import CameraConfig
    from voxelhashing_tpu.io.binarydump import BinaryDumpReader, write_sensor

    cam = CameraConfig(width=32, height=24, fx=26.0, fy=26.5,
                       cx=15.5, cy=11.25)
    rng = np.random.RandomState(0)
    frames = []
    poses = []
    for i in range(3):
        d = rng.uniform(0.5, 3.0, (24, 32)).astype(np.float32)
        d[0, : 5] = np.nan                       # invalid band
        c = rng.uniform(0, 1, (24, 32, 3)).astype(np.float32)
        frames.append((d, c))
        p = np.eye(4, dtype=np.float32)
        p[0, 3] = 0.01 * i
        poses.append(p)
    path = str(tmp_path / "seq.sensor")
    assert write_sensor(path, cam, frames, trajectory=poses) == 3

    r = BinaryDumpReader(path)
    assert r.version == 2
    assert len(r) == 3
    assert (r.depth_width, r.depth_height) == (32, 24)
    c2 = r.camera
    assert (c2.fx, c2.fy, c2.cx, c2.cy) == (26.0, 26.5, 15.5, 11.25)
    for i in range(3):
        d, c, p = r.read_frame(i)
        d0, c0 = frames[i]
        valid = np.isfinite(d0)
        np.testing.assert_array_equal(np.isfinite(d), valid)
        np.testing.assert_array_equal(d[valid], d0[valid])
        # color quantised to u8 on disk
        np.testing.assert_allclose(c, np.round(c0 * 255) / 255, atol=1/255)
        np.testing.assert_array_equal(p, poses[i])
    r.close()
