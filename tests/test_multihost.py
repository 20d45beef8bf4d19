"""True multi-host (multi-process) data parallelism over DCN.

The reference scales only via single-process ``torch.nn.DataParallel``
(/root/reference/interfaces/base.py:390-400).  This framework's multi-host
story (SURVEY.md §2.9 "TPU-native equivalent") is:

* every host calls ``jax.distributed.initialize`` and sees the global
  device set,
* one 1-D ``Mesh('data')`` spans all hosts (``multihost_data_mesh``),
* each host feeds its local shard of the global batch via
  ``jax.make_array_from_process_local_data``
  (``host_local_batch_to_global``),
* XLA inserts the cross-process gradient psum.

Until now those helpers were only exercised with ``process_count() == 1``.
This test actually runs the path: TWO OS processes, each with 4 virtual CPU
devices, form one 8-device mesh and execute one jitted train step with a
cross-process all-reduce (gloo CPU collectives).  Both processes' loss must
equal the single-process 8-device result on the same global batch.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_PROCS = 2
LOCAL_DEVICES = 4
BATCH = 8  # global; one row per device


def _run_step(local_rows=None) -> float:
    """One deterministic srcnn train step on the global 8-device data mesh.

    ``local_rows=None`` = single-process (the pytest parent, 8 virtual
    devices via conftest); a slice = this process's shard of the global
    batch in the 2-process run.  Model/state/batch are rebuilt identically
    everywhere from fixed seeds, mirroring how every host of a real slice
    constructs the same replicated state.
    """
    import jax

    from tpgsr_tpu.config import default_args, load_config
    from tpgsr_tpu.models.registry import ARCHS
    from tpgsr_tpu.models.srcnn import SRCNN
    from tpgsr_tpu.parallel import (
        host_local_batch_to_global,
        multihost_data_mesh,
        shard_params,
    )
    from tpgsr_tpu.train.state import create_train_state
    from tpgsr_tpu.train.step import make_train_step

    args = default_args(arch="srcnn", mask=False)
    config = load_config()
    config.TRAIN.compute_dtype = "fp32"  # exact cross-layout comparability
    b, h, w = BATCH, 8, 16
    model = SRCNN(scale_factor=2)
    state = create_train_state(
        jax.random.PRNGKey(0), model, (np.zeros((b, h, w, 3), np.float32),), n_sr=1
    )
    step = make_train_step(
        "srcnn", ARCHS["srcnn"], model, None, args, config, donate=False
    )

    rng = np.random.default_rng(0)
    batch = {
        "hr": rng.random((b, h * 2, w * 2, 3)).astype(np.float32),
        "lr": rng.random((b, h, w, 3)).astype(np.float32),
    }
    mesh = multihost_data_mesh()
    assert mesh.devices.size == N_PROCS * LOCAL_DEVICES
    state = shard_params(mesh, state)
    if local_rows is not None:
        batch = {k: v[local_rows] for k, v in batch.items()}
    gbatch = host_local_batch_to_global(mesh, batch)
    _, metrics = step(state, gbatch)
    return float(np.asarray(metrics["loss_total"]))


def _child_main(process_id: int, port: int) -> None:
    """Entry point for each spawned 'host' process."""
    import jax

    # sitecustomize force-registers the 'axon' TPU platform; undo it so the
    # virtual CPU devices from XLA_FLAGS are used (tests/conftest.py recipe).
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=N_PROCS,
        process_id=process_id,
    )
    assert jax.process_count() == N_PROCS
    assert jax.local_device_count() == LOCAL_DEVICES
    assert jax.device_count() == N_PROCS * LOCAL_DEVICES
    rows = slice(process_id * LOCAL_DEVICES, (process_id + 1) * LOCAL_DEVICES)
    loss = _run_step(local_rows=rows)
    print(f"MULTIHOST_LOSS {loss:.10f}", flush=True)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _child_env() -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    flags.append(f"--xla_force_host_platform_device_count={LOCAL_DEVICES}")
    env["XLA_FLAGS"] = " ".join(flags)
    return env


def test_two_process_data_parallel_step_matches_single_process():
    expected = _run_step()

    port = _free_port()
    env = _child_env()
    child_code = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        "import test_multihost as m; "
        "m._child_main(int(sys.argv[2]), int(sys.argv[3]))"
    )
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                "-c",
                child_code,
                os.path.join(REPO, "tests"),
                str(pid),
                str(port),
            ],
            env=env,
            cwd=REPO,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(N_PROCS)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"

    losses = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("MULTIHOST_LOSS ")]
        assert lines, f"no loss line in child output:\n{out}"
        losses.append(float(lines[-1].split()[1]))

    # both hosts see the identical (replicated) loss, equal to single-process
    np.testing.assert_allclose(losses[0], losses[1], rtol=0, atol=0)
    np.testing.assert_allclose(losses[0], expected, rtol=2e-4)


def test_non_primary_host_writes_no_files(tmp_path, monkeypatch):
    """Checkpoints, scalar logs, and visualization PNGs are process-0-only:
    multi-host runs replicate state on every host, so any other process
    writing would race process 0 on shared storage."""
    from jax._src import distributed

    from tpgsr_tpu.train import checkpoint as ckpt
    from tpgsr_tpu.train.logging import ScalarLogger
    from tpgsr_tpu.utils.visualize import test_display, tripple_display

    monkeypatch.setattr(distributed.global_state, "process_id", 1)
    assert not ckpt.is_primary_host()

    # save_checkpoint returns before touching the state or the filesystem
    ckpt.save_checkpoint(str(tmp_path / "ck"), None, {}, is_best=True)
    assert not os.path.exists(tmp_path / "ck")

    log = ScalarLogger(str(tmp_path / "tb"))
    log.add_scalar("loss/total", 1.0, 1)
    log.close()
    assert not os.path.exists(tmp_path / "tb")

    img = np.zeros((1, 4, 8, 3), np.float32)
    hr = np.zeros((1, 8, 16, 3), np.float32)
    tripple_display(img, hr, hr, ["a"], ["b"], ["b"], index=1,
                    vis_dir="v", out_root=str(tmp_path / "demo"))
    assert not os.path.exists(tmp_path / "demo")

    # the fixed-by-SR count is still computed (identical on every host)...
    n = test_display(img, hr, hr, ["a"], ["b"], ["b"],
                     str_filt=lambda s, v: s.lower(),
                     vis_dir="v", out_root=str(tmp_path / "disp"))
    assert n == 1
    # ...but nothing is written off the primary host
    assert not os.path.exists(tmp_path / "disp")

    monkeypatch.setattr(distributed.global_state, "process_id", 0)
    assert ckpt.is_primary_host()
