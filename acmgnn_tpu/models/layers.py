"""ACM layers — one implementation replacing the reference's three copies.

The reference carries three near-identical ``GraphConvolution`` classes
(/root/reference/ACM-Pytorch/models/layers.py:14-232,
/root/reference/ACM-Geometric/layers.py:13-120,
/root/reference/synthetic-experiments/baseline_models/layers.py:11-154) whose
only behavioral drift is whether LayerNorm fires before the channel
attention.  Here a single ``ACMConv`` is parameterized by
``(model_type, variant, structure_info, use_layernorm)``.

Math contract (mirrors /root/reference/ACM-Pytorch/models/layers.py:94-232):

- channels:  H_L = A_hat (X W_L),  H_H = (I - A_hat)(X W_H),  H_I = X W_I
  with ReLU placed per variant (ACM: after propagation; ACMII/``variant``:
  before propagation), identity channel always ``relu(X W_I)``;
- attention: ``alpha = softmax(sigmoid([H_L a_L || H_H a_H || H_I a_I])
  W_att / T, axis=1)`` with T = number of channels (3 or 4);
- output:    ``3 * sum_i alpha_i * H_i`` (3-channel) or ``1 * sum_i`` with
  the structure channel ``H_S = relu(A S)`` (4-channel, acmgcnp/pp with
  ``structure_info``);
- init:      U(-1/sqrt(F_out)) for channel weights / S, U(-1, 1) for the
  per-channel attention vectors, U(-1/sqrt(T)) for W_att
  (/root/reference/ACM-Pytorch/models/layers.py:70-92).

Known reference quirk, resolved deliberately (SURVEY.md §2.10): the
LayerNorm-before-attention branch is dead code in ACM-Pytorch (string
mismatch ``"acmgcn+"`` vs ``"acmgcnp"``) but live in ACM-Geometric.  We
expose it as ``use_layernorm`` so either pipeline's behavior is selectable.

High-pass products use ``spmm_high`` (``z - A_hat z``) — the explicit
``I - A_hat`` operator is never materialized.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from acmgnn_tpu.ops.graph import Operators
from acmgnn_tpu.ops.spmm import spmm, spmm_dual, spmm_high, spmm_multi


def _uniform(scale: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-scale, maxval=scale)

    return init


def _resolve_gemm_dtype(gemm_dtype):
    """None/'float32' => exact f32 GEMMs; 'bfloat16' => MXU-native bf16
    operands with float32 accumulation."""
    if gemm_dtype in (None, "float32"):
        return None
    if gemm_dtype == "bfloat16":
        return jnp.bfloat16
    raise ValueError(f"unknown gemm_dtype {gemm_dtype!r}")


def _make_mm(gemm_dtype):
    """Channel-projection matmul for one resolved gemm dtype.

    The wide-feature regimes (Penn94: F=4814 one-hot projections) are
    GEMM-bound, and the MXU runs bf16 at 2x the f32-emulation rate —
    ``preferred_element_type=float32`` keeps the accumulator exact, so
    only the operand mantissas are rounded (same class of rounding as
    the bf16 gather rows the headline config already uses)."""
    dt = _resolve_gemm_dtype(gemm_dtype)
    if dt is None:
        return lambda a, b: a @ b
    return lambda a, b: jnp.dot(
        a.astype(dt), b.astype(dt), preferred_element_type=jnp.float32
    )


# Above this input width the gather engine falls off its full descriptor
# rate (measured cliff at 128 columns, PERF.md "gather-width cliff"), so
# the hoisted input gather stops paying vs the projected [N, 2d] form.
HOIST_MAX_COLS = 128


def _ln_mode() -> str:
    """Attention-LayerNorm lowering: ``ACMGNN_LN_MODE`` in
    {"proj", "modules", "batched"} (default proj — see _make_lns).
    Legacy ``ACMGNN_LN_FUSED`` maps 1 -> batched, 0 -> modules when
    ACMGNN_LN_MODE is unset."""
    import os

    mode = os.environ.get("ACMGNN_LN_MODE")
    if mode is None:
        legacy = os.environ.get("ACMGNN_LN_FUSED")
        if legacy == "1":
            return "batched"
        if legacy == "0":
            return "modules"
        return "proj"
    if mode not in ("proj", "modules", "batched"):
        raise ValueError(f"unknown ACMGNN_LN_MODE: {mode!r}")
    return mode


class _LNParams(nn.Module):
    """Parameter shell matching ``nn.LayerNorm``'s ``{scale, bias}``
    variable tree, so the fused batched LayerNorm below keeps the exact
    checkpoint / torch-oracle param layout of the per-channel
    ``nn.LayerNorm`` modules it replaces (``layer_norm_<name>/scale``,
    ``.../bias``)."""

    dim: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.dim,)),
            self.param("bias", nn.initializers.zeros, (self.dim,)),
        )


class ACMConv(nn.Module):
    """Adaptive Channel Mixing graph convolution.

    One layer == three (or four) parallel filter channels mixed per node by
    a learned softmax over channel scores.
    """

    out_features: int
    model_type: str = "acmgcn"      # acmgcn|acmgcnp|acmgcnpp|acmsgc|acmsnowball|gcn|sgc|mlp
    variant: bool = False           # ACMII: ReLU before propagation
    structure_info: bool = False    # 4th structure channel (acmgcnp/pp only)
    use_layernorm: bool = False     # LN on channel outputs feeding attention
    nnodes: Optional[int] = None    # required when structure_info (for S)
    # First-layer input-side aggregation hoist (variant 0 only): since no
    # activation sits between projection and propagation,
    # ``A_hat (X W) == (A_hat X) W`` (reference math
    # /root/reference/ACM-Pytorch/models/layers.py:187-194), so a branch
    # can aggregate its INPUT once and derive both channels with dense
    # matmuls: ``z_low = (A x) W_L``, ``z_high = (x - A x) W_H``.  The
    # input gather carries no backward sparse work (layer-1 inputs are
    # data — no cotangent path), and branches fed the static feature
    # matrix consume the precomputed ``x_agg`` with ZERO gathers.
    input_hoist: bool = False
    # Channel-projection GEMM operand dtype ("bfloat16" halves MXU time
    # in wide-F regimes; f32 accumulation — see _make_mm).  Attention
    # scoring and mixing stay exact f32 (tiny GEMMs, accuracy-critical).
    gemm_dtype: Optional[str] = None

    def _make_lns(self, t: int, f_out: int):
        """LayerNorm state for the attention inputs (create once per
        call even when attention runs for both the train/eval branches).

        Three interchangeable forms share one
        ``layer_norm_<nm>/{scale,bias}`` parameter tree
        (``ACMGNN_LN_MODE``, see ``_ln_mode``):

        - ``proj`` (default): ``_LNParams`` shells consumed by the
          PROJECTED LayerNorm in ``_attention`` -- the normalized
          channels only feed rank-1 score projections, so LN collapses
          to row moments + one GEMV and the [N, d] normalized tensor is
          never materialized.
        - ``modules``: per-channel nn.LayerNorm (the r4 shipping form).
        - ``batched``: one stacked [N, T, d] normalization -- measured
          SLOWER on TPU v5e (penn94_pp 95.9 vs 94.6 ms, headline 139.9
          vs ~135.6; bench_r5_records r5_penn94_pp[_lnmod],
          r5_headline*): the ``jnp.stack`` materializes a channel copy
          XLA does not fuse away.  Kept for A/B."""
        names = ["low", "high", "mlp", "struc_low"][:t]
        if _ln_mode() in ("proj", "batched"):
            return [
                _LNParams(f_out, name=f"layer_norm_{nm}")()
                for nm in names
            ]
        # eps matches torch nn.LayerNorm (1e-5)
        return [
            nn.LayerNorm(epsilon=1e-5, name=f"layer_norm_{nm}")
            for nm in names
        ]

    def _attention_params(self, t: int, f_out: int):
        names = ["low", "high", "mlp", "struc_low"][:t]
        att_vecs = [
            self.param(f"att_vec_{nm}", _uniform(1.0), (f_out, 1))
            for nm in names
        ]
        att_mix = self.param("att_vec", _uniform(1.0 / math.sqrt(t)), (t, t))
        return att_vecs, att_mix

    def _attention(
        self, channels: list[jnp.ndarray], ln_mods=None, att_params=None
    ) -> jnp.ndarray:
        """Per-node softmax mixing weights, [N, T]."""
        t = len(channels)
        if att_params is None:
            att_params = self._attention_params(t, channels[0].shape[-1])
        att_vecs, att_mix = att_params
        if self.use_layernorm:
            if ln_mods is None:
                ln_mods = self._make_lns(t, channels[0].shape[-1])
            if isinstance(ln_mods[0], tuple) and _ln_mode() == "proj":
                # Projected LayerNorm (default): the normalized channels
                # are consumed ONLY by the rank-1 score projections, so
                # LN-then-project collapses algebraically to
                # project-then-normalize-SCALARS —
                #   LN(H)·a = (H·(scale⊙a) − mean(H)·Σ(scale⊙a))
                #             / sqrt(var(H)+eps) + bias·a
                # — one GEMV + row moments per channel, and the [N, d]
                # normalized tensor is never materialized (the batched-
                # stack form was measured SLOWER for exactly that copy;
                # see _make_lns).  Same math (flax fast-variance, eps
                # 1e-5) to float association; ACMGNN_LN_MODE selects
                # proj|batched|modules for A/B.
                parts = []
                for i in range(t):
                    s_i, b_i = ln_mods[i]
                    h = channels[i]
                    v = s_i[:, None] * att_vecs[i]          # [d, 1]
                    mu = jnp.mean(h, axis=-1, keepdims=True)
                    var = jnp.maximum(
                        jnp.mean(jnp.square(h), axis=-1, keepdims=True)
                        - jnp.square(mu),
                        0.0,
                    )
                    score = (h @ v - mu * jnp.sum(v)) * jax.lax.rsqrt(
                        var + 1e-5
                    ) + b_i @ att_vecs[i]
                    parts.append(score)
                scores = jnp.concatenate(parts, axis=1)  # [N, T]
                logits = (jax.nn.sigmoid(scores) @ att_mix) / t
                return jax.nn.softmax(logits, axis=1)
            if isinstance(ln_mods[0], tuple):
                # fused batched LayerNorm (ACMGNN_LN_MODE=batched): one
                # mean/var pass over the stacked [N, T, d] channels
                # (flax fast-variance math, eps 1e-5).  Measured slower
                # than per-channel modules on TPU v5e (the stack
                # materializes a channel copy) — kept for A/B.
                stack = jnp.stack(channels, axis=1)
                mu = jnp.mean(stack, axis=-1, keepdims=True)
                var = jnp.maximum(
                    jnp.mean(jnp.square(stack), axis=-1, keepdims=True)
                    - jnp.square(mu),
                    0.0,
                )
                norm = (stack - mu) * jax.lax.rsqrt(var + 1e-5)
                scale = jnp.stack([s for s, _ in ln_mods], axis=0)
                bias = jnp.stack([b for _, b in ln_mods], axis=0)
                normed = norm * scale[None] + bias[None]
                lns = [normed[:, i] for i in range(t)]
            else:
                lns = [ln_mods[i](channels[i]) for i in range(t)]
        else:
            lns = channels
        scores = jnp.concatenate(
            [lns[i] @ att_vecs[i] for i in range(t)], axis=1
        )  # [N, T]
        logits = (jax.nn.sigmoid(scores) @ att_mix) / t
        return jax.nn.softmax(logits, axis=1)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        ops: Operators,
        x_eval: Optional[jnp.ndarray] = None,
        x_agg: Optional[jnp.ndarray] = None,
        x_eval_agg: Optional[jnp.ndarray] = None,
    ):
        """Forward one ACM layer.

        ``x_eval``: optional second (eval-branch) input that rides the
        same fused gather as ``x`` — used by the joint training loop
        where the post-update eval forward and the next train forward
        share parameters.  Returns ``(out_train, out_eval)`` when given.
        Only the acmgcn/acmgcnp/acmgcnpp/acmsnowball paths support it.

        ``x_agg``/``x_eval_agg``: precomputed ``A_hat @ x`` (resp.
        ``A_hat @ x_eval``) for the input hoist — ONLY valid when the
        corresponding input equals the array the aggregate was computed
        from (the model container enforces this: static features, no
        dropout).  Ignored unless ``input_hoist`` and ``variant=False``.
        """
        f_in = x.shape[-1]
        f_out = self.out_features
        w_init = _uniform(1.0 / float(f_out) ** 0.5)
        mm = _make_mm(self.gemm_dtype)

        if x_eval is not None and self.model_type not in (
            "acmgcn", "acmgcnp", "acmgcnpp", "acmsnowball"
        ):
            raise ValueError(
                f"paired forward unsupported for {self.model_type!r}"
            )

        if self.model_type == "mlp":
            w_mlp = self.param("weight_mlp", w_init, (f_in, f_out))
            return mm(x, w_mlp)

        if self.model_type in ("sgc", "gcn", "snowball"):
            w_low = self.param("weight_low", w_init, (f_in, f_out))
            if self.input_hoist and not self.variant:
                # same commutation as the ACM hoist; these layers' inputs
                # are never dropout'd, so the precomputed aggregate is
                # valid in training too -> zero layer-1 sparse work
                y = x_agg
                if y is None and f_in <= HOIST_MAX_COLS:
                    y = spmm(ops.adj_low, jax.lax.stop_gradient(x))
                if y is not None:
                    return mm(y, w_low)
            return spmm(ops.adj_low, mm(x, w_low))

        if self.model_type == "acmgraphsage":
            # ACM channel mixing over SAGE-style transforms (the reference
            # lists this model but never implements it).
            h_low = jax.nn.relu(
                SAGEConv(f_out, name="sage_low")(x, ops)
            )
            h_high = jax.nn.relu(
                SAGEConv(f_out, high_pass=True, name="sage_high")(x, ops)
            )
            w_mlp = self.param("weight_mlp", w_init, (f_in, f_out))
            h_mlp = jax.nn.relu(mm(x, w_mlp))
            att = self._attention([h_low, h_high, h_mlp])
            return 3.0 * (
                att[:, 0:1] * h_low + att[:, 1:2] * h_high + att[:, 2:3] * h_mlp
            )

        w_low = self.param("weight_low", w_init, (f_in, f_out))
        w_high = self.param("weight_high", w_init, (f_in, f_out))
        w_mlp = self.param("weight_mlp", w_init, (f_in, f_out))

        if self.model_type == "acmsgc":
            # No ReLU anywhere (/root/reference/ACM-Pytorch/models/layers.py:162-174).
            # Note ops.adj_hp: with hops > 1 the low-pass is A_hat^k but the
            # high-pass stays I - A_hat (reference computes adj_high before
            # exponentiating, /root/reference/ACM-Pytorch/utils.py:626-637).
            if ops.adj_hp_base is None:
                h_low, h_high = spmm_dual(
                    ops.adj_low, mm(x, w_low), mm(x, w_high)
                )
            else:
                h_low = spmm(ops.adj_low, mm(x, w_low))
                h_high = spmm_high(ops.adj_hp, mm(x, w_high))
            h_mlp = mm(x, w_mlp)
            att = self._attention([h_low, h_high, h_mlp])
            return 3.0 * (
                att[:, 0:1] * h_low + att[:, 1:2] * h_high + att[:, 2:3] * h_mlp
            )

        # acmgcn / acmgcnp / acmgcnpp / acmsnowball.
        # All channel aggregations of the call (2 per branch; 4 when a
        # paired eval branch rides along) share ONE fused gather
        # (spmm_multi) — the SpMM is descriptor-bound on TPU (PERF.md).
        # With ``input_hoist`` (variant 0), a branch instead aggregates
        # its input (precomputed aggregate or one [N, F] gather) and
        # derives both channels by dense matmuls — see the class
        # docstring for the commutation identity.
        paired = x_eval is not None
        branches = [x, x_eval] if paired else [x]
        pre_aggs = [x_agg, x_eval_agg] if paired else [x_agg]
        can_hoist = self.input_hoist and not self.variant
        hoisted = [
            can_hoist
            and (pre_aggs[b] is not None or f_in <= HOIST_MAX_COLS)
            for b in range(len(branches))
        ]
        need = [
            b for b in range(len(branches))
            if hoisted[b] and pre_aggs[b] is None
        ]
        if need:
            # hoisted branches without a precomputed aggregate share one
            # fused input gather; stop_gradient makes the no-backward
            # property structural (layer-1 inputs are data — no cotangent
            # reaches them), so no transpose gather is even traced
            got = spmm_multi(
                ops.adj_low,
                [jax.lax.stop_gradient(branches[b]) for b in need],
                [False] * len(need),
            )
            for b, y in zip(need, got):
                pre_aggs[b] = y
        proj = [b for b in range(len(branches)) if not hoisted[b]]
        proj_aggs = {}
        if proj:
            pre = []  # (z_low, z_high) per projected branch
            for b in proj:
                xb = branches[b]
                if self.variant:  # ACMII: propagate post-activation features
                    pre.append((
                        jax.nn.relu(mm(xb, w_low)),
                        jax.nn.relu(mm(xb, w_high)),
                    ))
                else:
                    pre.append((mm(xb, w_low), mm(xb, w_high)))
            zs = [z for pair in pre for z in pair]
            flags = [False, True] * len(proj)
            # eval-branch entries carry no gradient: they feed metrics
            # only, so the backward transposes just the train prefix
            n_train = sum(1 for b in proj if b == 0)
            grad_prefix = (
                2 * n_train if paired and n_train < len(proj) else None
            )
            outs_p = spmm_multi(ops.adj_low, zs, flags, grad_prefix=grad_prefix)
            for i, b in enumerate(proj):
                proj_aggs[b] = (outs_p[2 * i], outs_p[2 * i + 1])
        aggs = []
        for b in range(len(branches)):
            if hoisted[b]:
                y = pre_aggs[b]
                if f_in > HOIST_MAX_COLS:
                    # wide-feature regime (wiki-2M: F=600 x 1.93M nodes):
                    # derive the high channel as x W_H - (A x) W_H so no
                    # [N, F] difference temp is ever materialized — two
                    # [N, d] MXU products instead (same math, float
                    # association differs).  Also keeps a bfloat16-stored
                    # aggregate out of the f32 subtraction.
                    aggs.extend([
                        mm(y, w_low),
                        mm(branches[b], w_high) - mm(y, w_high),
                    ])
                else:
                    aggs.extend(
                        [mm(y, w_low), mm(branches[b] - y, w_high)]
                    )
            else:
                aggs.extend(list(proj_aggs[b]))

        use_structure = (
            self.structure_info
            and self.model_type in ("acmgcnp", "acmgcnpp")
            and ops.adj_unnorm is not None
        )
        if use_structure and self.nnodes is None:
            raise ValueError("structure_info requires nnodes")
        t_channels = 4 if use_structure else 3
        ln_mods = (
            self._make_lns(t_channels, f_out) if self.use_layernorm
            else None
        )
        att_params = self._attention_params(t_channels, f_out)
        h_struc = None
        if use_structure:
            # the structure channel depends only on parameters — shared
            # verbatim across the train/eval branches
            s = self.param("struc_low", w_init, (self.nnodes, f_out))
            h_struc = jax.nn.relu(spmm(ops.adj_unnorm, s))

        outs = []
        for b, xb in enumerate(branches):
            h_low, h_high = aggs[2 * b], aggs[2 * b + 1]
            if not self.variant:
                h_low = jax.nn.relu(h_low)
                h_high = jax.nn.relu(h_high)
            h_mlp = jax.nn.relu(mm(xb, w_mlp))
            if use_structure:
                att = self._attention(
                    [h_low, h_high, h_mlp, h_struc], ln_mods, att_params
                )
                outs.append(
                    1.0
                    * (
                        att[:, 0:1] * h_low
                        + att[:, 1:2] * h_high
                        + att[:, 2:3] * h_mlp
                        + att[:, 3:4] * h_struc
                    )
                )
            else:
                att = self._attention([h_low, h_high, h_mlp], ln_mods, att_params)
                outs.append(
                    3.0
                    * (
                        att[:, 0:1] * h_low
                        + att[:, 1:2] * h_high
                        + att[:, 2:3] * h_mlp
                    )
                )
        return tuple(outs) if paired else outs[0]


class SAGEConv(nn.Module):
    """GraphSAGE-style convolution: ``[x || A_hat x] W``.

    The reference lists ``graphsage`` as a CLI choice but never implements
    it (/root/reference/ACM-Pytorch/arg_parser.py:22-41 vs
    models/models.py:50-92 — constructing it crashes).  This is a working
    mean-aggregator SAGE layer using the framework's row-normalized
    operator (self-loop-inclusive mean).
    """

    out_features: int
    high_pass: bool = False   # aggregate with (I - A_hat) instead (ACM use)

    @nn.compact
    def __call__(self, x: jnp.ndarray, ops: Operators) -> jnp.ndarray:
        agg = spmm_high(ops.adj_hp, x) if self.high_pass else spmm(
            ops.adj_low, x
        )
        f_in = x.shape[-1]
        w_init = _uniform(1.0 / float(self.out_features) ** 0.5)
        w_self = self.param("weight_self", w_init, (f_in, self.out_features))
        w_agg = self.param("weight_agg", w_init, (f_in, self.out_features))
        return x @ w_self + agg @ w_agg


class GCNIIConv(nn.Module):
    """GCNII layer: ``((1-a) A_hat h + a h0)((1-b_l) I + b_l W)`` with
    ``b_l = log(lambda/l + 1)`` (Chen et al. 2020).  ``gcnII`` is another
    dead CLI choice in the reference; implemented here for real."""

    out_features: int
    layer_index: int = 1
    alpha: float = 0.1
    lamda: float = 0.5

    @nn.compact
    def __call__(
        self, h: jnp.ndarray, h0: jnp.ndarray, ops: Operators
    ) -> jnp.ndarray:
        beta = math.log(self.lamda / self.layer_index + 1.0)
        support = (1.0 - self.alpha) * spmm(ops.adj_low, h) + self.alpha * h0
        w_init = _uniform(1.0 / float(self.out_features) ** 0.5)
        w = self.param("weight", w_init, (h.shape[-1], self.out_features))
        return (1.0 - beta) * support + beta * (support @ w)


class MLPBlock(nn.Module):
    """Plain MLP with BatchNorm, used as the acmgcnpp input-skip network
    (/root/reference/ACM-Pytorch/models/layers.py:245-285).

    ``num_layers == 1`` degenerates to a single Linear (logistic
    regression) — the reference's default ``init_layers_X = 1`` path.
    """

    hidden_channels: int
    out_channels: int
    num_layers: int = 1
    dropout: float = 0.0
    # see ACMConv.gemm_dtype — the acmgcnpp skip-MLP's first Linear is an
    # F-wide projection in the same GEMM-bound regime.  Params, bias add
    # and outputs stay float32; only the matmul OPERANDS are bf16, with
    # an f32 accumulator — exactly ``_make_mm``'s contract (ADVICE r4:
    # the earlier nn.Dense(dtype=bf16) form rounded the matmul output
    # and bias add to bf16, one extra rounding per layer).
    gemm_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, training: bool = False) -> jnp.ndarray:
        gdt = _resolve_gemm_dtype(self.gemm_dtype)

        def bf16_dot_general(a, b, dimension_numbers, precision=None,
                             preferred_element_type=None):
            return jax.lax.dot_general(
                a.astype(gdt), b.astype(gdt), dimension_numbers,
                precision=precision,
                preferred_element_type=jnp.float32,
            )

        def dense(features, name):
            # torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
            fan_in = x_cur.shape[-1]
            bound = 1.0 / float(fan_in) ** 0.5
            return nn.Dense(
                features,
                kernel_init=_uniform(bound),
                bias_init=_uniform(bound),
                dot_general=None if gdt is None else bf16_dot_general,
                name=name,
            )

        x_cur = x
        if self.num_layers == 1:
            return dense(self.out_channels, "lin_0")(x_cur)

        for i in range(self.num_layers - 1):
            x_cur = dense(self.hidden_channels, f"lin_{i}")(x_cur)
            x_cur = jax.nn.relu(x_cur)
            x_cur = nn.BatchNorm(
                use_running_average=not training,
                momentum=0.9,
                epsilon=1e-5,
                name=f"bn_{i}",
            )(x_cur)
            x_cur = nn.Dropout(rate=self.dropout, deterministic=not training)(x_cur)
        return dense(self.out_channels, f"lin_{self.num_layers - 1}")(x_cur)
