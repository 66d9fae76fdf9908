"""Multi-process GSPMD worker + shared logic for the 2-process distributed
test (`tests/test_multiprocess_distributed.py`).

Run as a script it becomes one process of an N-process CPU "cluster"
(`jax.distributed.initialize` rendezvous on localhost, 4 virtual devices per
process), executing the framework's REAL multi-host path: per-host
`BucketBatcher` row slices of the same global batch ->
`assemble_global_batch` (`jax.make_array_from_process_local_data`) ->
the GSPMD train step over the global 8-device mesh -> collective Orbax
save/restore. Equivalent of the reference's actually-running DDP
(`/root/reference/src/train_v1_1_dist.py:507-599`), which rendezvouses NCCL
processes the same way.

Imported as a module, `run_steps(host_id=0, num_hosts=1)` is the
single-process reference the parent test compares losses against.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_FEATS = 16
BATCH_SIZE = 8
N_ITEMS = 20
OUT_SIZE = 16
TEXT_BUCKET = 16
FRAME_BUCKET = 32


def build_model():
    """Tiny GradTTS (same scale as __graft_entry__.dryrun_multichip)."""
    from arttts_tpu.core.config import DecoderConfig, EncoderConfig, ModelConfig
    from arttts_tpu.models.tts import GradTTSModel

    cfg = ModelConfig(
        name="grad_tts",
        n_feats=N_FEATS,
        encoder=EncoderConfig(
            kind="text",
            n_vocab=64,
            n_channels=32,
            filter_channels=64,
            filter_channels_dp=32,
            n_heads=2,
            n_layers=2,
        ),
        decoder=DecoderConfig(dim=16),
    )
    return GradTTSModel(config=cfg)


def build_items(n=N_ITEMS, seed=0):
    """Deterministic synthetic items — identical on every process."""
    rng = np.random.default_rng(seed)
    items = []
    for _ in range(n):
        t_x = int(rng.integers(6, 13))
        t_y = int(rng.integers(20, 33))
        items.append(
            {
                "x": rng.integers(1, 64, size=(t_x,)).astype(np.int64),
                "y": rng.standard_normal((t_y, N_FEATS)).astype(np.float32),
            }
        )
    return items


def run_steps(host_id: int, num_hosts: int, ckpt_dir: str | None = None):
    """Iterate the multi-host data pipeline through the GSPMD train step.

    Returns (losses, params_checksum). Both the 1-process/8-device and the
    2-process/4-device-each runs execute the SAME global mesh shape and the
    SAME global batches, so losses must match across process topologies.
    """
    import jax

    # sharding-invariant RNG so the partitioned random draws are identical
    # across process topologies of the same global mesh
    jax.config.update("jax_threefry_partitionable", True)
    import jax.numpy as jnp

    from arttts_tpu.data.batching import BucketBatcher, pad_batch
    from arttts_tpu.parallel.mesh import (
        assemble_global_batch,
        make_mesh,
        replicate,
    )
    from arttts_tpu.train.step import create_train_state, make_train_step

    model = build_model()
    items = build_items()
    key = jax.random.PRNGKey(0)
    ex = pad_batch(
        items[:2], text_buckets=(TEXT_BUCKET,), frame_buckets=(FRAME_BUCKET,)
    )
    variables = jax.jit(model.init)(
        {"params": key, "dropout": key},
        jnp.asarray(ex["x"]),
        jnp.asarray(ex["x_lengths"]),
        jnp.asarray(ex["y"]),
        jnp.ones((2, FRAME_BUCKET, 1)),
        jnp.zeros((2,)),
    )

    mesh = make_mesh(n_data=jax.device_count())
    state = create_train_state(model, variables, 1e-4)
    # host-local numpy -> replicated global arrays (identical on all hosts)
    state = state.replace(
        step=np.asarray(state.step),
        params=jax.tree.map(np.asarray, state.params),
        opt_state=jax.tree.map(np.asarray, state.opt_state),
    )
    state = state.replace(
        step=replicate(mesh, state.step),
        params=replicate(mesh, state.params),
        opt_state=replicate(mesh, state.opt_state),
    )
    step = make_train_step(model, out_size=OUT_SIZE, mesh=mesh, donate=False)

    batcher = BucketBatcher(
        [it["y"].shape[0] for it in items],
        BATCH_SIZE,
        shuffle=True,
        seed=37,
        host_id=host_id,
        num_hosts=num_hosts,
    )
    losses = []
    for i, idx in enumerate(batcher):
        local = pad_batch(
            [items[int(j)] for j in idx],
            text_buckets=(TEXT_BUCKET,),
            frame_buckets=(FRAME_BUCKET,),
        )
        batch = assemble_global_batch(mesh, local, num_hosts=num_hosts)
        state, metrics = step(state, np.asarray(jax.random.PRNGKey(100 + i)), batch)
        losses.append(float(metrics["total_loss"]))

    checksum = float(
        sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(state.params))
    )
    if ckpt_dir:
        from arttts_tpu.core.checkpoint import load_checkpoint, save_checkpoint

        save_checkpoint(
            ckpt_dir, "grad_0", state.params, opt_state=None, step=1
        )
        restored = load_checkpoint(os.path.join(ckpt_dir, "grad_0"))
        re_sum = float(
            sum(np.sum(np.abs(x)) for x in jax.tree.leaves(restored["params"]))
        )
        np.testing.assert_allclose(re_sum, checksum, rtol=1e-6)
    return losses, checksum


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--ckpt-dir", default=None)
    args = ap.parse_args()

    import jax

    # the container's sitecustomize pins the axon TPU backend; re-pin to CPU
    # BEFORE jax.distributed touches any backend (XLA_FLAGS with
    # --xla_force_host_platform_device_count=4 comes from the parent env)
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert jax.process_count() == args.num_processes
    losses, checksum = run_steps(
        host_id=args.process_id,
        num_hosts=args.num_processes,
        ckpt_dir=args.ckpt_dir,
    )
    print(
        "DIST_RESULT "
        + json.dumps(
            {
                "process": args.process_id,
                "local_devices": jax.local_device_count(),
                "global_devices": jax.device_count(),
                "losses": losses,
                "checksum": checksum,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
