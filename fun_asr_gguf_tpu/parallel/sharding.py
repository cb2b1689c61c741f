"""Parameter sharding rules (tensor parallelism for the Qwen3 decoder).

Megatron-style TP laid out for NamedSharding + jit: q/k/v and gate/up are
column-sharded over the 'tp' axis (heads / ffn slices stay local), o and
down are row-sharded (XLA inserts the psum on their outputs), norms and
embeddings are replicated. Encoder FFNs get the same column/row split; its
4-head attention stays replicated (too small to matter).
"""

from typing import Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


_COL_PARALLEL = ("q_w", "k_w", "v_w", "gate_w", "up_w",
                 "qkv_w", "gate_up_w",
                 # MLA (deepseek): per-head expansions shard on heads;
                 # shared experts are a plain dense MLP
                 "q_b_w", "kv_b_w", "shared_gate_w", "shared_up_w")
_ROW_PARALLEL = ("o_w", "down_w", "shared_down_w")
_MOE_EXPERT = ("moe_gate_w", "moe_up_w", "moe_down_w")
# MLA low-rank down-projections + the shared rotary key: small, and the
# rmsnorm over the compressed dim needs the full vector — replicate
_MLA_REPL = ("q_a_w", "kv_a_w")


def llm_param_sharding(mesh: Mesh, params: Dict = None) -> Dict:
    """PartitionSpec pytree matching the qwen3 param layout
    (stacked layers: leading axis = layer), either the unpacked or the
    ``pack_qwen3_params`` fused layout.

    Dense weights are [L, in, out]; QuantTensor weights are
    (q=[L, out, in], d=[L, out, in/32]) — so column-parallel shards axis 2
    for dense / axis 1 for quantized, and row-parallel the reverse. When
    ``params`` is given, the spec mirrors its key set and dense/quantized
    mix (the quantized TP path runs through the jnp dequant-dot, which XLA
    partitions; the single-chip Pallas kernel is unaffected). Note on the
    fused qkv layout: a plain column split cuts across the q/k/v boundary,
    so GSPMD inserts resharding around the head-split — correct, and the
    single-chip decode path (where fusion matters) never pays it.
    """
    from ..ops.quant_matmul import QuantTensor

    repl = P()

    def wspec(key):
        from ..models.qwen3 import Int4Weight, Int8Weight
        w = params["layers"].get(key) if params is not None else None
        if key in _COL_PARALLEL:
            if isinstance(w, QuantTensor):
                return QuantTensor(q=P(None, "tp", None),
                                   d=P(None, "tp", None))
            if isinstance(w, Int8Weight):
                return Int8Weight(w8=P(None, None, "tp"),
                                  scale=P(None, None, "tp"))
            if isinstance(w, Int4Weight):
                return Int4Weight(packed=P(None, None, "tp"),
                                  scale=P(None, None, "tp"))
            return P(None, None, "tp")
        if isinstance(w, QuantTensor):
            # row-parallel: contraction dim sharded; q8 blocks (32 wide)
            # stay intact as long as in/tp % 32 == 0
            return QuantTensor(q=P(None, None, "tp"),
                               d=P(None, None, "tp"))
        if isinstance(w, Int8Weight):
            # row-parallel: contraction sharded; per-out-channel scales
            # replicated
            return Int8Weight(w8=P(None, "tp", None),
                              scale=P(None, None, None))
        if isinstance(w, Int4Weight):
            # row-parallel: packed k/2 and group-scale k/32 axes shard
            # alike (k/tp stays a multiple of 32 for every real config)
            return Int4Weight(packed=P(None, "tp", None),
                              scale=P(None, "tp", None))
        return P(None, "tp", None)

    def moe_spec(key):
        """Expert parallelism: stacked expert weights [L, E, k, n] shard
        the EXPERT axis over 'tp' (each device holds E/tp experts; the
        dense-dispatch einsums contract the expert axis, so GSPMD runs
        each shard locally and psums the combine — see
        models.qwen3._moe_dense_dispatch)."""
        from ..models.qwen3 import Int8Weight
        w = params["layers"].get(key) if params is not None else None
        if isinstance(w, Int8Weight):
            return Int8Weight(w8=P(None, "tp", None, None),
                              scale=P(None, "tp", None, None))
        return P(None, "tp", None, None)

    if params is not None:
        matmul_keys = tuple(k for k in params["layers"]
                            if k in _COL_PARALLEL + _ROW_PARALLEL)
        moe_keys = tuple(k for k in params["layers"] if k in _MOE_EXPERT)
    else:
        matmul_keys = ("q_w", "k_w", "v_w", "gate_w", "up_w") + _ROW_PARALLEL
        moe_keys = ()
    norm_keys = ("input_ln", "post_ln", "q_norm", "k_norm",
                 "attn_post_ln", "ffn_post_ln",   # gemma sandwich norms
                 "q_a_norm", "kv_a_norm")         # MLA low-rank norms
    # qwen2-family attention biases: [L, out] — column-split with their
    # projection's output channels
    bias_keys = ("q_b", "k_b", "v_b", "qkv_b")
    if params is not None:
        present = params["layers"]
        norm_keys = tuple(k for k in norm_keys if k in present)
        bias_keys = tuple(k for k in bias_keys if k in present)
    else:
        bias_keys = ()
    layers = {k: repl for k in norm_keys}
    for key in bias_keys:
        layers[key] = P(None, "tp")
    for key in matmul_keys:
        layers[key] = wspec(key)
    for key in moe_keys:
        layers[key] = moe_spec(key)
    if params is not None and "router_w" in params["layers"]:
        layers["router_w"] = repl       # tiny; feeds a replicated top-k
        if "router_b" in params["layers"]:
            layers["router_b"] = repl
    if params is not None:
        for key in _MLA_REPL:
            if key in params["layers"]:
                layers[key] = repl
        # catch-all: any layer key without an explicit rule replicates
        # (small vectors: attention sinks, o_proj/expert biases, the
        # qwen2moe shared-expert gate, ...). Without this, a new param
        # key crashes device_put with a spec-tree mismatch instead of
        # degrading to replication.
        for key in params["layers"]:
            if key not in layers:
                layers[key] = repl
    spec = {"layers": layers, "final_ln": repl, "embed": repl}
    if params is not None and "layers_pre" in params:
        # heterogeneous dense prefix (deepseek first-k dense layers):
        # same per-key rules, with weight TYPES read from the pre stack
        # (its dense MLP keys are absent from the MoE main stack)
        from ..models.qwen3 import Int4Weight, Int8Weight

        def pre_spec(key):
            w = params["layers_pre"][key]
            col = key in _COL_PARALLEL
            if isinstance(w, QuantTensor):
                return (QuantTensor(q=P(None, "tp", None),
                                    d=P(None, "tp", None)) if col else
                        QuantTensor(q=P(None, None, "tp"),
                                    d=P(None, None, "tp")))
            if isinstance(w, Int8Weight):
                return (Int8Weight(w8=P(None, None, "tp"),
                                   scale=P(None, None, "tp")) if col else
                        Int8Weight(w8=P(None, "tp", None),
                                   scale=P(None, None, None)))
            if isinstance(w, Int4Weight):
                return (Int4Weight(packed=P(None, None, "tp"),
                                   scale=P(None, None, "tp")) if col else
                        Int4Weight(packed=P(None, "tp", None),
                                   scale=P(None, "tp", None)))
            return P(None, None, "tp") if col else P(None, "tp", None)

        pre = {}
        for key in params["layers_pre"]:
            if key in _COL_PARALLEL + _ROW_PARALLEL:
                pre[key] = pre_spec(key)
            elif key in bias_keys:
                pre[key] = P(None, "tp")
            else:
                pre[key] = repl
        spec["layers_pre"] = pre
    if params is not None and "lm_head" in params:
        spec["lm_head"] = repl
    if params is not None and "lm_head_q" in params:
        spec["lm_head_q"] = QuantTensor(q=P("tp", None), d=P("tp", None))
    if params is not None and "lm_head_i8" in params:
        # vocab-parallel int8 head: [hidden, vocab] cols + [vocab] scales
        spec["lm_head_i8"] = (P(None, "tp"), P("tp"))
    return jax.tree_util.tree_map(
        lambda p: NamedSharding(mesh, p), spec,
        is_leaf=lambda x: isinstance(x, P))


def encoder_param_sharding(mesh: Mesh, params) -> Dict:
    """Shard encoder/adaptor/CTC FFN weights over tp, replicate the rest.

    Works structurally: any leaf named ffn.w1/w2 (or linear1/linear2 on the
    adaptors) gets column/row split when divisible; everything else is
    replicated.
    """
    tp = mesh.shape["tp"]

    def spec_for(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        joined = ".".join(str(n) for n in names)
        nd = leaf.ndim
        def col():
            # column-shard last dim when divisible
            if leaf.shape[-1] % tp == 0:
                return P(*([None] * (nd - 1) + ["tp"]))
            return P()
        def row():
            if leaf.shape[-2] % tp == 0:
                return P(*([None] * (nd - 2) + ["tp", None]))
            return P()
        if joined.endswith("w1.w") or joined.endswith("linear1.w"):
            return col()
        if joined.endswith("w2.w") or joined.endswith("linear2.w"):
            return row()
        if joined.endswith("w1.b") or joined.endswith("linear1.b"):
            if leaf.shape[-1] % tp == 0:
                return P(*([None] * (nd - 1) + ["tp"]))
            return P()
        return P()

    specs = jax.tree_util.tree_map_with_path(spec_for, params)
    return jax.tree_util.tree_map(
        lambda p: NamedSharding(mesh, p), specs,
        is_leaf=lambda x: isinstance(x, P))


def moe_ep_dispatch(xf, topv, topi, gw, uw, dw, cfg, mesh: Mesh,
                    axis: str = "tp"):
    """Explicit expert-parallel MoE dispatch (shard_map form).

    Each device holds E/ep experts (expert axis sharded over ``axis``),
    computes the dense dispatch for its local shard with the routing
    one-hot masked to local expert ids, and a psum combines the
    contributions — tokens routed to remote experts contribute zero
    locally. This is the decode-friendly EP form (no weight all-gather);
    the GSPMD path gets the same collective from the einsum contraction
    over the sharded expert axis.

    xf [N, h] activations, topv/topi [N, K] routing, gw/uw/dw stacked
    expert weights [E, k, n] (single layer). Returns [N, h] f32.
    """
    from jax.experimental.shard_map import shard_map

    from ..models.qwen3 import _moe_dense_dispatch
    ep = mesh.shape[axis]
    if cfg.n_experts % ep:
        raise ValueError(f"n_experts={cfg.n_experts} not divisible by "
                         f"mesh axis {axis}={ep}")
    n_local = cfg.n_experts // ep

    def local_fn(xf, topv, topi, gw, uw, dw):
        idx = jax.lax.axis_index(axis)
        out = _moe_dense_dispatch(
            xf, topv, topi, gw, uw, dw, cfg,
            expert_offset=idx * n_local, n_local=n_local)
        return jax.lax.psum(out, axis)

    wspec = P(axis, None, None)
    return shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(), P(), wspec, wspec, wspec),
        out_specs=P(),
        check_rep=False,
    )(xf, topv, topi, gw, uw, dw)


def replicated(mesh: Mesh, params):
    shard = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda _: shard, params)


def shard_llm_params(params, mesh: Mesh):
    """Place LLM params on the mesh according to the TP rules."""
    return jax.device_put(params, llm_param_sharding(mesh, params))


def shard_params(params, shardings):
    return jax.device_put(params, shardings)
