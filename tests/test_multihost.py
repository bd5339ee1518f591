"""Multi-host simulation: 2 processes x 4 virtual CPU devices = 8-device mesh.

The tier the reference lacks (SURVEY.md section 4): real
``jax.distributed.initialize`` rendezvous between two OS processes, a global
mesh spanning both, per-host data sharding via
``host_local_batch_to_global``, a cross-host reduction, and the stop-flag
broadcast (the analog of the reference's only multi-GPU test,
tests/test_cli.py:119 test_train_gpu with device="0,1").
"""

import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

WORKER = textwrap.dedent(
    """
    import os, sys
    import numpy as np

    sys.path.insert(0, os.environ["BSYOLO_REPO"])

    import jax
    jax.config.update("jax_platforms", "cpu")

    from bsyolo_tpu.parallel import dist as pdist
    from bsyolo_tpu.parallel import make_mesh

    pdist.initialize()  # from JAX_COORDINATOR_ADDRESS / _NUM_PROCESSES / _PROCESS_ID
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4, jax.local_device_count()

    mesh = make_mesh()  # all 8 global devices on the "data" axis

    # per-host shard: host i contributes rows [i*4, i*4+4)
    pid = pdist.process_index()
    local = np.arange(4, dtype=np.float32) + 4 * pid
    g = pdist.host_local_batch_to_global({"x": local}, mesh)["x"]
    assert g.shape == (8,), g.shape

    total = float(jax.jit(lambda v: v.sum())(g))  # cross-host all-reduce via XLA
    assert total == float(np.arange(8).sum()), total

    # stop-flag broadcast: rank 0's value wins on every host
    flag = pdist.broadcast_scalar(7.0 if pdist.is_main_process() else 0.0, mesh)
    assert flag == 7.0, flag

    print(f"proc {pid}: ok total={total} flag={flag}")
    """
)


TRAIN_WORKER = textwrap.dedent(
    """
    import os, sys
    import numpy as np

    sys.path.insert(0, os.environ["BSYOLO_REPO"])

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bsyolo_tpu.parallel import dist as pdist
    from bsyolo_tpu.parallel import make_mesh, replicated_sharding

    pdist.initialize()
    mesh = make_mesh()

    from bsyolo_tpu.nn import build_model, parse_model_yaml
    from bsyolo_tpu.engine.optim import OptimConfig
    from bsyolo_tpu.engine.train_step import StepConfig, init_train_state, make_train_step
    from bsyolo_tpu.losses import DetectionLossConfig

    # minimal 5-conv + Detect graph: the full yolo11n compiles too slowly for
    # two simultaneous processes on a 1-core CI host; the machinery under
    # test (TAL loss, optimizer, cross-host grad reduce) is model-agnostic
    d = {
        "nc": 4,
        "scales": {"n": [1.0, 1.0, 1024]},
        "backbone": [
            [-1, 1, "Conv", [16, 3, 2]],
            [-1, 1, "Conv", [16, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "Conv", [64, 3, 2]],
        ],
        "head": [[[2, 3, 4], 1, "Detect", ["nc"]]],
    }
    spec = parse_model_yaml(d, scale="n")
    model, variables = build_model(spec, img_size=64, dtype=jnp.float32)

    gbatch = 8  # global; 4 per host
    step_cfg = StepConfig(
        loss=DetectionLossConfig(nc=spec.nc, strides=spec.head_strides),
        optim=OptimConfig(name="SGD", lr0=0.01, epochs=1, nbs=gbatch),
        batch_size=gbatch, nb=2, nw=2, use_adamw=False, weight_decay=0.0,
    )
    step = make_train_step(model, step_cfg)
    state = jax.device_put(init_train_state(variables), replicated_sharding(mesh))

    pid = pdist.process_index()
    local = pdist.local_batch_size(gbatch)
    rng = np.random.default_rng(pid)  # DIFFERENT data per host
    M = 8
    host_batch = {
        "img": rng.uniform(0, 1, (local, 64, 64, 3)).astype(np.float32),
        "cls": np.zeros((local, M), np.int32),
        "bboxes": np.tile(np.asarray([[0.5, 0.5, 0.25, 0.25]], np.float32), (local, M, 1)),
        "mask": np.pad(np.ones((local, 1), np.float32), ((0, 0), (0, M - 1))),
    }
    batch = pdist.host_local_batch_to_global(host_batch, mesh)
    state, metrics = step(state, batch)
    loss = float(metrics["loss"])
    assert np.isfinite(loss), loss
    # params updated from BOTH hosts' grads must agree everywhere
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated
    checksum = float(jnp.sum(jnp.abs(leaf)))
    print(f"proc {pid}: trainstep ok loss={loss:.4f} checksum={checksum:.6f}")
    """
)


def _spawn_two(script_path, extra_env=None, timeout=540):
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    addr = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env.update(
            BSYOLO_REPO=str(REPO),
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            JAX_COORDINATOR_ADDRESS=addr,
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            **(extra_env or {}),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script_path)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = [p.communicate(timeout=timeout)[0] for p in procs]
    return procs, outs


@pytest.mark.slow
def test_two_process_train_step(tmp_path):
    """Full jitted detect train step over a 2-host mesh with per-host data."""
    script = tmp_path / "train_worker.py"
    script.write_text(TRAIN_WORKER)
    procs, outs = _spawn_two(script)
    lines = []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        lines.append([l for l in out.splitlines() if "trainstep ok" in l][0])
    # loss and updated-param checksum must be bitwise-identical across hosts
    assert lines[0].split("loss=")[1] == lines[1].split("loss=")[1], lines


@pytest.mark.slow
def test_two_process_mesh(tmp_path):
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    addr = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()

    script = tmp_path / "worker.py"
    script.write_text(WORKER)

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env.update(
            BSYOLO_REPO=str(REPO),
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            JAX_COORDINATOR_ADDRESS=addr,
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert "ok total=28.0 flag=7.0" in out, out
