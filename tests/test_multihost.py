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


def _distributed_init(process_id: int, port: int) -> None:
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


def _child_main(process_id: int, port: int) -> None:
    """Entry point for each spawned 'host' process (train-step test)."""
    _distributed_init(process_id, port)
    rows = slice(process_id * LOCAL_DEVICES, (process_id + 1) * LOCAL_DEVICES)
    loss = _run_step(local_rows=rows)
    print(f"MULTIHOST_LOSS {loss:.10f}", flush=True)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn_children(entry: str, attempts: int = 3, timeout: int = 600):
    """Run ``tests/test_multihost.py::<entry>(pid, port)`` in N_PROCS child
    processes; returns their stdouts.

    The free-port probe is inherently TOCTOU (another process can grab the
    port between the probe closing and the coordinator binding), so a child
    failing with a bind error retries the WHOLE spawn on a fresh port
    instead of flaking (ADVICE r2).
    """
    env = _child_env()
    child_code = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        "import test_multihost as m; "
        f"m.{entry}(int(sys.argv[2]), int(sys.argv[3]))"
    )
    last_outs = None
    for attempt in range(attempts):
        port = _free_port()
        procs = [
            subprocess.Popen(
                [sys.executable, "-c", child_code,
                 os.path.join(REPO, "tests"), str(pid), str(port)],
                env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
            for pid in range(N_PROCS)
        ]
        outs = []
        try:
            for p in procs:
                out, _ = p.communicate(timeout=timeout)
                outs.append(out)
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
        last_outs = outs
        if all(p.returncode == 0 for p in procs):
            return outs
        bind_race = any(
            p.returncode != 0
            and ("already in use" in out.lower() or "failed to bind" in out.lower()
                 or "bind address" in out.lower())
            for p, out in zip(procs, outs)
        )
        if not bind_race:
            for pid, (p, out) in enumerate(zip(procs, outs)):
                assert p.returncode == 0, f"process {pid} failed:\n{out}"
    raise AssertionError(
        f"coordinator bind kept failing after {attempts} attempts:\n"
        + "\n---\n".join(last_outs or [])
    )


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

    outs = _spawn_children("_child_main")
    losses = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("MULTIHOST_LOSS ")]
        assert lines, f"no loss line in child output:\n{out}"
        losses.append(float(lines[-1].split()[1]))

    # both hosts see the identical (replicated) loss, equal to single-process
    np.testing.assert_allclose(losses[0], losses[1], rtol=0, atol=0)
    np.testing.assert_allclose(losses[0], expected, rtol=2e-4)


# ----------------------------------------------------------- eval (go_test)


def _eval_metrics() -> dict:
    """Full evaluate() (metrics aggregation + CTC decode accuracy) over the
    global 8-device mesh.  Deterministic fixtures: every process builds the
    identical model state + val batches from fixed seeds, exactly as every
    host of a real slice would construct its replicated state and run its
    identical (shuffle=False) val loader.  Exercises a partial final batch
    (5 rows padded to the 8-row compiled shape)."""
    import jax

    from tpgsr_tpu.config import default_args, load_config
    from tpgsr_tpu.models.crnn import CRNN
    from tpgsr_tpu.models.registry import ARCHS
    from tpgsr_tpu.models.srcnn import SRCNN
    from tpgsr_tpu.charset import CTC_NUM_CLASSES
    from tpgsr_tpu.ops.ctc import ctc_ids_to_strings
    from tpgsr_tpu.parallel import multihost_data_mesh, shard_params
    from tpgsr_tpu.train.evaluate import evaluate
    from tpgsr_tpu.train.state import create_train_state
    from tpgsr_tpu.train.step import make_eval_step, parse_crnn_data

    args = default_args(arch="srcnn", mask=False)
    config = load_config()
    config.TRAIN.compute_dtype = "fp32"
    b, h, w = BATCH, 16, 64
    model = SRCNN(scale_factor=2)
    stu = CRNN(nclass=CTC_NUM_CLASSES)
    teacher = stu.init(
        jax.random.PRNGKey(5), np.zeros((1, 32, 100, 1), np.float32), train=False
    )
    state = create_train_state(
        jax.random.PRNGKey(0), model,
        (np.zeros((b, h, w, 3), np.float32),), n_sr=1,
        stu_model=stu, n_stu=0, teacher_variables=teacher,
    )
    step = make_eval_step("srcnn", ARCHS["srcnn"], model, stu, args, config)

    rng = np.random.default_rng(7)
    batches = []
    for nb in (BATCH, 5):  # full batch + partial (pads to the 8-row shape)
        hr = rng.random((nb, h * 2, w * 2, 3)).astype(np.float32)
        lr = rng.random((nb, h, w, 3)).astype(np.float32)
        batches.append({"hr": hr, "lr": lr})
    # labels := the random CRNN's own HR predictions on even rows ("live"
    # accuracy strictly inside (0,1)); unmatchable text on odd rows
    import flax.linen as nn  # noqa: F401  (keeps jax import order stable)

    for batch in batches:
        logits = stu.apply(teacher, parse_crnn_data(batch["hr"], 100), train=False)
        preds = ctc_ids_to_strings(np.argmax(np.asarray(logits), -1))
        batch["labels"] = [
            preds[i] if i % 2 == 0 else "zzzz" for i in range(len(preds))
        ]

    mesh = multihost_data_mesh()
    assert mesh.devices.size == N_PROCS * LOCAL_DEVICES
    state = shard_params(mesh, state)
    return evaluate(step, state, batches, mesh=mesh)


def _eval_child_main(process_id: int, port: int) -> None:
    """Entry point for each spawned 'host' process (eval test)."""
    _distributed_init(process_id, port)
    md = _eval_metrics()
    import json

    print("MULTIHOST_EVAL " + json.dumps(md), flush=True)


def test_two_process_eval_matches_single_process():
    """evaluate() runs under process_count()==2: each host device_puts only
    its addressable slice of every (padded) batch, the per-sample outputs
    are allgathered back, and BOTH hosts report the metric_dict of the FULL
    val set, equal to the single-process run — so best-checkpoint selection
    agrees on every host (VERDICT r2 missing item 3)."""
    import json

    expected = _eval_metrics()
    assert 0.0 < expected["accuracy_hr"] < 1.0  # the live-accuracy trick took

    outs = _spawn_children("_eval_child_main")
    mds = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("MULTIHOST_EVAL ")]
        assert lines, f"no eval line in child output:\n{out}"
        mds.append(json.loads(lines[-1][len("MULTIHOST_EVAL "):]))

    assert mds[0] == mds[1]  # identical on every host
    for k, v in expected.items():
        if isinstance(v, float):
            np.testing.assert_allclose(mds[0][k], v, rtol=1e-5, err_msg=k)
        else:
            assert mds[0][k] == v, k


def test_loader_process_sharding_disjoint_and_complete():
    """DataLoader(shard_index/shard_count): hosts draw DISJOINT contiguous
    slices of every seeded global batch, and their concatenation in process
    order reproduces the unsharded batch exactly (the layout
    host_local_batch_to_global assembles) — each global sample appears once
    per step, not once per host (ADVICE r2: duplicated data bug)."""
    from tpgsr_tpu.data.loader import DataLoader

    n, bs = 37, 8
    ds = list(range(n))
    collate = lambda items: {"x": np.asarray(items)}

    def batches(shard_index, shard_count):
        dl = DataLoader(ds, bs, collate, shuffle=True, drop_last=True,
                        seed=3, shard_index=shard_index, shard_count=shard_count)
        return [b["x"] for b in dl]

    full = batches(0, 1)
    s0 = batches(0, 2)
    s1 = batches(1, 2)
    assert len(full) == len(s0) == len(s1) == n // bs
    for f, a, b in zip(full, s0, s1):
        assert a.shape == b.shape == (bs // 2,)
        assert not set(a.tolist()) & set(b.tolist())
        np.testing.assert_array_equal(np.concatenate([a, b]), f)

    import pytest

    with pytest.raises(ValueError):
        DataLoader(ds, 7, collate, shard_count=2)  # 7 % 2 != 0
    with pytest.raises(ValueError):
        DataLoader(ds, 8, collate, drop_last=False, shard_count=2)


# ------------------------------------------------- chunked dispatch (train)


def _run_chain(local_rows=None):
    """k=3 chained srcnn train steps fed through the trainer's OWN
    ``_chunked_device_prefetch`` (the TRAIN.dispatch_chain>1 path).

    ``local_rows=None`` = single-process over the 8 virtual devices (the
    device_put branch); a slice = this process's shard in the 2-process run,
    exercising the ``process_count>1`` branch — each host stacks its local
    batch shards and ``jax.make_array_from_process_local_data`` assembles
    the global ``[k, B, ...]`` array sharded P(None, 'data')
    (train/trainer.py:93-103).  Returns the per-step loss stack.
    """
    import jax

    from tpgsr_tpu.config import default_args, load_config
    from tpgsr_tpu.models.registry import ARCHS
    from tpgsr_tpu.models.srcnn import SRCNN
    from tpgsr_tpu.parallel import multihost_data_mesh, shard_params
    from tpgsr_tpu.train import trainer as trainer_mod
    from tpgsr_tpu.train.state import create_train_state
    from tpgsr_tpu.train.step import make_train_step

    args = default_args(arch="srcnn", mask=False)
    config = load_config()
    config.TRAIN.compute_dtype = "fp32"
    b, h, w, k = BATCH, 8, 16, 3
    model = SRCNN(scale_factor=2)
    state = create_train_state(
        jax.random.PRNGKey(0), model, (np.zeros((b, h, w, 3), np.float32),), n_sr=1
    )
    inner = make_train_step(
        "srcnn", ARCHS["srcnn"], model, None, args, config, donate=False
    )
    chain = jax.jit(lambda s, stacked: jax.lax.scan(inner, s, stacked))

    rng = np.random.default_rng(0)
    batches = [
        {
            "hr": rng.random((b, h * 2, w * 2, 3)).astype(np.float32),
            "lr": rng.random((b, h, w, 3)).astype(np.float32),
        }
        for _ in range(k)
    ]
    mesh = multihost_data_mesh()
    assert mesh.devices.size == N_PROCS * LOCAL_DEVICES
    state = shard_params(mesh, state)
    if local_rows is not None:
        batches = [{n: v[local_rows] for n, v in bt.items()} for bt in batches]

    losses = None
    for kk, stacked in trainer_mod._chunked_device_prefetch(batches, mesh, [k]):
        assert kk == k
        _, ms = chain(state, stacked)
        losses = np.asarray(ms["loss_total"])
    assert losses is not None and losses.shape == (k,)
    return [float(x) for x in losses]


def _chain_child_main(process_id: int, port: int) -> None:
    """Entry point for each spawned 'host' process (chunked-dispatch test)."""
    _distributed_init(process_id, port)
    rows = slice(process_id * LOCAL_DEVICES, (process_id + 1) * LOCAL_DEVICES)
    losses = _run_chain(local_rows=rows)
    print("MULTIHOST_CHAIN " + " ".join(f"{x:.10f}" for x in losses), flush=True)


def test_two_process_chunked_dispatch_matches_single_process():
    """TRAIN.dispatch_chain's multi-host branch: two OS processes each stack
    their local shards of k batches, the global [k, B, ...] stack is
    assembled via make_array_from_process_local_data, and the scanned
    k-step loss stack equals the single-process chain (VERDICT r3 item 8)."""
    expected = _run_chain()

    outs = _spawn_children("_chain_child_main")
    stacks = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("MULTIHOST_CHAIN ")]
        assert lines, f"no chain line in child output:\n{out}"
        stacks.append([float(x) for x in lines[-1].split()[1:]])

    np.testing.assert_allclose(stacks[0], stacks[1], rtol=0, atol=0)
    np.testing.assert_allclose(stacks[0], expected, rtol=2e-4)


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
