"""Pipeline parallelism (GPipe) over homogeneous transformer blocks.

The reference's only parallelism is process-per-GPU DDP (detectron2/engine/
launch.py) — it has no pipeline story. On TPU, pipelining is a shard_map
program over a 'pipe' mesh axis: the L identical blocks of a transformer
stack are split into contiguous stages of L/P blocks, each stage's
parameters live on one pipe rank (stacked along a leading block axis that is
sharded over 'pipe'), and microbatches stream through the stages with one
`jax.lax.ppermute` hop per tick. The schedule is the classic GPipe fill/
drain: M microbatches take M + P - 1 ticks, a bubble fraction of
(P-1)/(M+P-1). Everything is built from differentiable primitives (scan,
ppermute, dynamic slicing), so `jax.grad` gives 1F1B-equivalent backward
for free and the pipeline composes with DP (batch axis), TP (parallel/
tp.py) and SP (parallel/mesh.py) in the same jitted program.

Where it applies here: the in-graph transformer stacks — the CLIP text
encoder's 12 `resblocks` (pretraining runs it per step on every caption;
reference clip_backbone.py:732-814) and the ClipCap V2L mapper's 8
`layers` inside the CDDMSL train step (reference clipcap.py:149-163).
Both are sequences of identical pre-LN blocks, the homogeneity GPipe
stacking requires. The per-chip parameter/activation win is modest at
CLIP scale; the point is the mechanism — the same utility pipelines any
block-homogeneous tower (deeper text towers, GPT-2 decode stacks) with
layouts that ride ICI neighbor hops only.

Usage inside a Flax module (see models/backbone/text_encoder.py):

    if self.pipeline_axis and not self.is_initializing():
        stacked = stack_trees([b.variables["params"] for b in self.resblocks])
        x = pipeline_blocks(block_apply, stacked, x, axis=self.pipeline_axis)
    else:
        for b in self.resblocks: x = b(x)

Reading the bound submodules' `.variables` keeps the checkpoint layout
(per-block `resblocks_i` subtrees) unchanged — stacking happens in-graph,
and gradients flow back through the stack/unstack automatically.
"""

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P


def stack_trees(trees: Sequence[Any]):
    """Stack a list of identically-structured pytrees along a new leading
    (block) axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, 0), *trees)


def ambient_mesh():
    """The mesh installed by `jax.sharding.set_mesh` (trainer/test context),
    or None outside any mesh context."""
    mesh = jax.sharding.get_abstract_mesh()
    return None if mesh is None or not mesh.axis_names else mesh


def pipeline_batch_spec(mesh, batch_axis: str = "data") -> P:
    """Batch PartitionSpec for the pipelined segment: keep the batch sharded
    over `batch_axis` when the mesh carries it (DP x PP), replicated
    otherwise."""
    return P(batch_axis) if batch_axis in mesh.axis_names else P()


def pipeline_blocks(
    block_apply: Callable[[Any, jnp.ndarray], jnp.ndarray],
    stacked_params: Any,
    x: jnp.ndarray,
    mesh=None,
    axis: str = "pipe",
    microbatches: Optional[int] = None,
    batch_spec: P = P(),
):
    """Apply L stacked blocks to x via GPipe over the `axis` mesh axis.

    block_apply: (one block's param subtree, activations) -> activations,
        shape-preserving (residual blocks).
    stacked_params: pytree whose leaves carry a leading block axis of size L
        (from `stack_trees`); L must divide by the pipe-axis size P. Sharded
        leading-axis over `axis` inside the program, so each pipe rank holds
        the parameters of its own L/P contiguous blocks ONLY.
    x: (B, ...) activations; B must divide by `microbatches` (after any
        `batch_spec` sharding).
    mesh: concrete or abstract Mesh; defaults to the ambient set_mesh mesh.
    microbatches: GPipe microbatch count M (default: the pipe-axis size).
    batch_spec: PartitionSpec of x's leading dim (e.g. P('data') under
        DP x PP — each data row pipelines its own batch shard).

    Exactness: identical to sequential application (same op order per
    microbatch), verified bit-exact in tests/test_pipeline_parallel.py.
    """
    if mesh is None:
        mesh = ambient_mesh()
        assert mesh is not None, "pipeline_blocks needs a mesh (set_mesh or pass one)"
    pp = mesh.shape[axis]
    n_blocks = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    assert n_blocks % pp == 0, f"{n_blocks} blocks not divisible by pipe axis {pp}"
    M = microbatches if microbatches else pp
    param_specs = jax.tree_util.tree_map(lambda _: P(axis), stacked_params)

    def local_fn(blocks, xin):
        b = xin.shape[0]
        assert b % M == 0, f"local batch {b} not divisible by {M} microbatches"
        mb = b // M
        p = jax.lax.axis_index(axis)
        x_mb = xin.reshape((M, mb) + xin.shape[1:])

        def stage(act):
            def body(a, bp):
                return block_apply(bp, a), None

            out, _ = jax.lax.scan(body, act, blocks)
            return out

        # scan carries must be varying on `axis` (axis_index/ppermute make
        # the body outputs so); zeros_like(x_mb) inherits x's other varying
        # axes, one pcast adds `axis`
        outputs0 = jax.lax.pcast(jnp.zeros_like(x_mb), (axis,), to="varying")
        acts0 = outputs0[0]

        def tick(carry, t):
            acts, outputs = carry
            # rank 0 feeds microbatch t; everyone else consumes what the
            # previous rank sent last tick. Bubble ticks compute on junk and
            # are masked out at the write.
            feed = jax.lax.dynamic_index_in_dim(x_mb, jnp.clip(t, 0, M - 1), 0, keepdims=False)
            y = stage(jnp.where(p == 0, feed, acts))
            y_next = jax.lax.ppermute(y, axis, [(i, i + 1) for i in range(pp - 1)])
            # rank P-1 finished microbatch t-(P-1)
            idx = jnp.clip(t - (pp - 1), 0, M - 1)
            write = (t >= pp - 1) & (p == pp - 1)
            cur = jax.lax.dynamic_index_in_dim(outputs, idx, 0, keepdims=False)
            outputs = jax.lax.dynamic_update_index_in_dim(outputs, jnp.where(write, y, cur), idx, 0)
            return (y_next, outputs), None

        (_, outputs), _ = jax.lax.scan(tick, (acts0, outputs0), jnp.arange(M + pp - 1))
        # only the last rank holds real outputs; broadcast them back so the
        # surrounding (non-pipelined) ops see the full activations
        out = jax.lax.psum(jnp.where(p == pp - 1, outputs, jnp.zeros_like(outputs)), axis)
        return out.reshape(xin.shape)

    fn = shard_map(local_fn, mesh=mesh, in_specs=(param_specs, batch_spec), out_specs=batch_spec)
    return fn(stacked_params, x)
