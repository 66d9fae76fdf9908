"""Jitted SPMD training step.

The reference trains with a host-side epoch loop, Adam(1e-4), per-submodule
gradient clipping to max-norm 1 (`/root/reference/src/train.py:166-199`), and
DDP gradient all-reduce for multi-GPU (`train_v1_1_dist.py`). Here the whole
step — encoder fwd, in-graph MAS, segment cut, U-Net fwd/bwd, clip, Adam —
is one jitted XLA program. Data parallelism comes from sharding the batch
over the mesh's "data" axis; GSPMD inserts the gradient all-reduces over ICI
(no DDP hooks, no NCCL: SURVEY.md §2.10).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from arttts_tpu.parallel.mesh import batch_sharding, replicated
from arttts_tpu.train.losses import grad_tts_loss


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )


# The reference clips ONLY the encoder and decoder parameter groups
# (train.py:176-181, train_v6.py:184-189); the speaker modules (v6's
# SpeakerEncodingLayer, multi-spk GradTTS's embedding table) are never
# clipped. Matching that exactly keeps training dynamics comparable
# (verified by the convergence-parity studies).
_UNCLIPPED_SUBMODULES = ("spk_encoder", "spk_table")


def per_submodule_clip(max_norm: float) -> optax.GradientTransformation:
    """Clip gradient global-norm *per top-level submodule* to `max_norm`,
    mirroring the reference's separate encoder/decoder clip
    (train.py:176-181). Speaker modules stay unclipped like the reference.
    Returns the clipped updates and, as a side channel, nothing — norms are
    recomputed in metrics if needed."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def clip_subtree(subtree):
            norm = optax.global_norm(subtree)
            scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
            return jax.tree_util.tree_map(lambda g: g * scale, subtree)

        # updates is a dict keyed by top-level submodule name
        clipped = {
            k: v if k in _UNCLIPPED_SUBMODULES else clip_subtree(v)
            for k, v in updates.items()
        }
        return clipped, state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(learning_rate: float, grad_clip_norm: float = 1.0):
    """Adam(lr) with per-submodule clipping (ref train.py:163,176-181)."""
    return optax.chain(
        per_submodule_clip(grad_clip_norm),
        optax.adam(learning_rate),
    )


def create_train_state(model, variables, learning_rate: float, grad_clip_norm: float = 1.0):
    params = variables["params"]
    tx = make_optimizer(learning_rate, grad_clip_norm)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        tx=tx,
    )


def _make_step_fn(model, out_size: Optional[int], loss_fn: Callable):
    """The un-jitted single-step core shared by `make_train_step` and
    `make_train_multistep`: encoder fwd, in-graph MAS, segment cut, U-Net
    fwd/bwd, per-submodule clip, Adam (ref train.py:166-199)."""

    def step_fn(state: TrainState, rng, batch):
        pinned = None
        if "pinned_t" in batch:
            pinned = (batch["pinned_t"], batch["pinned_z"], batch["pinned_offsets"])

        def loss_of(params):
            total, parts = loss_fn(
                model,
                {"params": params},
                rng,
                batch["x"],
                batch["x_lengths"],
                batch["y"],
                batch["y_lengths"],
                spk=batch.get("spk"),
                durations=batch.get("durations"),
                out_size=out_size,
                train=True,
                pinned=pinned,
            )
            return total, parts

        (total, parts), grads = jax.value_and_grad(loss_of, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads)
        metrics = dict(parts)
        metrics["total_loss"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return step_fn


def make_train_step(
    model,
    out_size: Optional[int],
    loss_fn: Callable = grad_tts_loss,
    mesh=None,
    donate: bool = True,
):
    """Build a jitted train step. With a mesh, inputs are annotated so the
    batch shards over "data" and the state replicates (GSPMD DP).

    If the batch carries `pinned_t` / `pinned_z` / `pinned_offsets`, the
    loss's stochastic draws are overridden by them (convergence-parity study
    vs the torch reference, which pins the same values via monkeypatched
    `torch.rand`/`torch.randn`/`random.choice`)."""

    step_fn = _make_step_fn(model, out_size, loss_fn)

    if mesh is not None:
        b = batch_sharding(mesh)
        r = replicated(mesh)
        # State shardings are inherited from the caller's committed layout:
        # `replicate(mesh, state)` gives plain DP; `shard_tp(mesh, state)`
        # (parallel/tp.py) lays params + Adam moments out over the "model"
        # axis and GSPMD partitions the matmuls/convs accordingly. Pinning
        # the state replicated here would silently gather a TP state back.
        return jax.jit(
            step_fn,
            in_shardings=(None, r, b),
            out_shardings=(None, r),
            donate_argnums=(0,) if donate else (),
        )
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_train_multistep(
    model,
    out_size: Optional[int],
    n_steps: int,
    loss_fn: Callable = grad_tts_loss,
    mesh=None,
    donate: bool = True,
):
    """`n_steps` full optimizer steps in ONE jitted program (`lax.scan` over
    a stacked batch pytree).

    The reference dispatches one DDP step per host-loop iteration
    (train.py:166-199); on TPU behind a remote dispatch path one launch per
    step leaves the device idle between launches (r4 trace: 13.2 ms wall vs
    ~5.6 ms device busy at B=16). Scanning K steps per dispatch amortizes
    launch overhead to 1/K and lets XLA overlap the optimizer update of step
    i with the forward of step i+1.

    Args:
      batches: pytree whose leaves are the single-step batch leaves stacked
        on a NEW leading axis of length `n_steps` (all from the same shape
        bucket). `rng` is one key; micro-step i uses `fold_in(rng, i)`.
    Returns `(new_state, metrics)` with each metric leaf stacked `(n_steps,)`.
    """

    core = _make_step_fn(model, out_size, loss_fn)

    def steps_fn(state: TrainState, rng, batches):
        keys = jax.vmap(lambda i: jax.random.fold_in(rng, i))(
            jnp.arange(n_steps)
        )

        def body(st, key_batch):
            k, b = key_batch
            return core(st, k, b)

        return jax.lax.scan(body, state, (keys, batches))

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        b = NamedSharding(mesh, P(None, "data"))  # (step, batch, ...)
        r = replicated(mesh)
        return jax.jit(
            steps_fn,
            in_shardings=(None, r, b),
            out_shardings=(None, r),
            donate_argnums=(0,) if donate else (),
        )
    return jax.jit(steps_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(model, loss_fn: Callable = grad_tts_loss, mesh=None):
    """Validation loss without the segment cut (full sequences), no grads."""

    def step_fn(state: TrainState, rng, batch):
        total, parts = loss_fn(
            model,
            {"params": state.params},
            rng,
            batch["x"],
            batch["x_lengths"],
            batch["y"],
            batch["y_lengths"],
            spk=batch.get("spk"),
            durations=batch.get("durations"),
            out_size=None,
            train=False,
        )
        metrics = dict(parts)
        metrics["total_loss"] = total
        return metrics

    if mesh is not None:
        b = batch_sharding(mesh)
        r = replicated(mesh)
        return jax.jit(step_fn, in_shardings=(r, r, b), out_shardings=r)
    return jax.jit(step_fn)
