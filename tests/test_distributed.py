"""Multi-host (2-process) distributed engine test.

Spawns two REAL processes that bring up ``jax.distributed`` (coordination
service + Gloo CPU collectives), build a 4-device global mesh (2 virtual
CPU devices per process), and run the SAME shard_map step the virtual
single-process tests use — proving the sharded engine is multi-host-clean
(global-array inputs, no process-local assumptions).

The reference has no distributed path at all (SURVEY.md §2.10); this is
the beyond-reference north star's test anchor.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

_WORKER = textwrap.dedent("""
    import sys
    sys.path.insert(0, %(repo)r)
    import numpy as np
    import jax
    from voxelhashing_tpu.parallel import distributed, sharded

    pid = int(sys.argv[1])
    distributed.initialize("localhost:%(port)d", num_processes=2,
                           process_id=pid, cpu_devices_per_process=2)
    assert jax.device_count() == 4, jax.device_count()
    assert jax.local_device_count() == 2

    from voxelhashing_tpu import evaluation
    from voxelhashing_tpu.config import (CameraConfig, EngineConfig,
                                         FilterConfig, MapConfig,
                                         TrackerConfig)
    from voxelhashing_tpu.io.synthetic import (Scene, make_trajectory,
                                               render_depth)

    cam = CameraConfig(width=128, height=96, fx=104.0, fy=104.0,
                       cx=63.5, cy=47.5)
    cfg = EngineConfig(
        camera=cam,
        map=MapConfig(voxel_size=0.02, truncation=0.06,
                      truncation_scale=0.01, num_blocks=16384,
                      table_size=65536, max_active_blocks=16384),
        tracker=TrackerConfig(levels=2, max_outer_iter=(6, 4),
                              max_inner_iter=(1, 1), dist_thres=(0.15, 0.15),
                              normal_thres=(0.9, 0.9),
                              angle_trans_thres=(1.0, 1.0),
                              dist_trans_thres=(1.0, 1.0),
                              residual_early_out=(1e-9, 1e-9)),
        filter=FilterConfig(depth_filter=False),
    )
    mesh = distributed.global_mesh()
    poses = make_trajectory(4)
    state, lcfg = distributed.create_sharded_global(
        cfg, mesh, initial_pose=poses[0])
    step = sharded.make_sharded_step(cfg, mesh)
    scene = Scene()
    est = []
    for p in poses:
        d, c = render_depth(p, cam, scene)
        dg = distributed.replicate(np.nan_to_num(d, nan=0.0), mesh)
        cg = distributed.replicate(c, mesh)
        state, pose = step(state, dg, cg)
        est.append(distributed.fetch_replicated(pose))
    ate = evaluation.ate_rmse(est, [np.asarray(p) for p in poses],
                              align=False)
    # this process's addressable map shards are non-empty + key-consistent
    from voxelhashing_tpu.geometry import INVALID_KEY
    local_keys = [np.asarray(s.data)[0]
                  for s in state.map.block_key.addressable_shards]
    n_local = sum(int((k != INVALID_KEY).sum()) for k in local_keys)
    print("RESULT pid=%%d ate=%%.6f n_local=%%d" %% (pid, ate, n_local),
          flush=True)
    assert ate < 0.012, ate
    assert n_local > 0
    print("WORKER_OK", flush=True)
""")


def test_two_process_distributed_step(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = _WORKER % {"repo": repo, "port": port}
    env = dict(os.environ)
    # the worker picks its own backend (CPU + 2 devices) before init
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen([sys.executable, "-c", script, str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True, env=env)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for i, out in enumerate(outs):
        assert "WORKER_OK" in out, f"worker {i} failed:\n{out[-3000:]}"
    # both processes observed the same trajectory
    ates = [line for out in outs for line in out.splitlines()
            if line.startswith("RESULT")]
    assert len(ates) == 2
    a0 = float(ates[0].split("ate=")[1].split()[0])
    a1 = float(ates[1].split("ate=")[1].split()[0])
    np.testing.assert_allclose(a0, a1, atol=1e-6)
