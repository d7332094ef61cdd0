"""Device-mesh sharding for batched generation and serving.

The reference is strictly single-GPU (SURVEY.md §2.3: no DP/TP/PP anywhere);
its only batching is the CFG pair + num_images_per_prompt fan-out. The
TPU-native scaling story is data parallelism over ICI: shard the image batch
axis across a 1-D mesh with ``jax.sharding``; XLA inserts any collectives
(there are none in the steady state — sampling is embarrassingly parallel per
image, so scaling is linear in chips).

Design notes:
  * Per-sample PRNG keys make results identical regardless of mesh shape
    (seed determinism across chip counts, SURVEY.md §4 test item e).
  * Known multi-chip optimization (round 2): the CFG doubling
    (concat([x, x]) against a [uncond..., cond...] context) places a
    sample's uncond and cond halves on different devices under plain
    batch sharding, so GSPMD inserts an all-to-all inside the scan.
    Interleaving the pair per sample ([u0, c0, u1, c1, ...]) keeps it
    device-local (done inside make_denoise_fn). Residual collectives in
    the compiled scan are (a) the semantically required scalar
    all-reduces of the region std (it is global over the CFG batch by
    reference semantics) and (b) GSPMD auto-resharding choices on the
    tiny validation shapes; full control lives in
    parallel/spmd.py's shard_map runner (only the region-std psum
    remains, by reference semantics).
  * Params are replicated; activations sharded on batch. At SD scale
    (<1B params) tensor/pipeline parallelism would only add latency.
  * Multi-host: the same code runs under ``jax.distributed`` with a DCN+ICI
    mesh; batch stays on the outer (DCN) axis so collectives never cross
    hosts in the hot loop.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_mesh(devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), axis_names=("data",))


def shard_batch(mesh: Mesh, tree):
    """Shard every array's leading (batch) axis across the mesh."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


def cfg_batch_sharding(mesh: Mesh):
    """Sharding for [uncond..., cond...] CFG-doubled tensors: still the
    leading axis — each device holds matching uncond/cond slices only if
    batch%devices==0 on each half; we therefore shard the *image* batch and
    keep the CFG doubling inside each device's shard (the pipeline
    concatenates per-shard)."""
    return NamedSharding(mesh, P("data"))
