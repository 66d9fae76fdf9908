"""Tensor parallelism over the mesh's "model" axis.

The reference has no model-parallel path at all (DDP only,
`/root/reference/src/train_v1_1_dist.py`); this module is TPU-native
headroom for wider configs. The design is GSPMD-idiomatic: *no* hand-written
collectives and no module changes — parameters are laid out sharded on their
channel axis, activations stay batch-sharded, and XLA's SPMD partitioner
propagates the layouts through every matmul/conv and inserts the
all-reduces over ICI where contractions cross the sharded axis.

One shape-based rule covers the whole state: every >=2-D array whose last
axis is divisible by the model-axis size is sharded on that axis
(Dense (in, out) -> out; Conv (K, Cin, Cout) -> Cout; Embed (V, D) -> D),
everything else (biases, norm scales, scalars) is replicated. Because Adam's
mu/nu mirror the parameter shapes, the same rule applied to the full
TrainState shards the optimizer state consistently — a ZeRO-3-flavoured
bonus: per-device parameter + optimizer memory drops by ~1/n_model.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def tp_sharding(mesh: Mesh, tree):
    """Pytree of NamedShardings for `tree` under the shape rule above."""
    n_model = mesh.shape.get("model", 1)

    def spec(x):
        shape = getattr(x, "shape", ())
        if (
            n_model > 1
            and len(shape) >= 2
            and shape[-1] % n_model == 0
            and shape[-1] >= 2 * n_model
        ):
            return NamedSharding(
                mesh, P(*([None] * (len(shape) - 1) + ["model"]))
            )
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec, tree)


def shard_tp(mesh: Mesh, tree):
    """Device-put `tree` (TrainState / params) with model-axis sharding."""
    shardings = tp_sharding(mesh, tree)
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)
