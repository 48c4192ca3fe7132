"""ACM-GNN model zoo.

One ``ACMGNN`` container replaces the reference's three copy-pasted ``GCN``
classes (/root/reference/ACM-Pytorch/models/models.py:25-166,
/root/reference/ACM-Geometric/models.py:23-76,
/root/reference/synthetic-experiments/baseline_models/models.py:6-39).

Stacks per ``model_type`` (matching the reference where it works):

- ``acmgcn``/``acmgcnp``/``acmgcnpp``: dropout(x) -> ACMConv(F->H) -> relu
  -> dropout -> ACMConv(H->C); ``acmgcnpp`` additionally feeds
  ``dropout(relu(mlpX(x)))`` as a skip into the second layer
  (/root/reference/ACM-Pytorch/models/models.py:106-166).
- ``acmsgc``: dropout(x) -> single no-ReLU ACMConv(F->C) over ``A_hat^k``.
  (The reference's main-package forward returns an unbound variable here —
  a latent crash; we return the single layer's output, matching the
  synthetic package's working implementation.)
- ``acmsnowball``: densely-concatenated snowball stacking
  (/root/reference/ACM-Pytorch/models/models.py:123-150).
- ``gcn``/``mlp``: working 2-layer baselines; ``sgc``: 1-layer linear on the
  propagated features (/root/reference/synthetic-experiments/
  baseline_models/models.py:6-39 — the main package's CLI lists these but
  crashes; here they work everywhere).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from acmgnn_tpu.models.layers import ACMConv, GCNIIConv, MLPBlock, SAGEConv
from acmgnn_tpu.ops.graph import Operators

MODEL_TYPES = (
    "acmgcn",
    "acmgcnp",
    "acmgcnpp",
    "acmsgc",
    "acmsnowball",
    "acmgraphsage",
    "gcn",
    "sgc",
    "mlp",
    "graphsage",
    "snowball",
    "gcnII",
)

_ACM_FAMILY = (
    "acmgcn", "acmgcnp", "acmgcnpp", "acmsgc", "acmsnowball", "acmgraphsage"
)


class ACMGNN(nn.Module):
    """Model container dispatching on ``model_type``."""

    nhid: int
    nclass: int
    model_type: str = "acmgcn"
    nlayers: int = 1                 # acmsnowball depth
    dropout: float = 0.5
    variant: bool = False
    structure_info: bool = False
    use_layernorm: bool = False      # LN-pre-attention (geometric pipeline)
    nnodes: Optional[int] = None     # required when structure_info
    init_layers_X: int = 1           # acmgcnpp skip-MLP depth
    alpha: float = 0.1               # gcnII initial-residual strength
    lamda: float = 0.5               # gcnII identity-map decay
    # First-layer input hoist (ACMConv.input_hoist; variant-0 ACM stacks
    # only): layer 1 aggregates its input instead of its projections, and
    # no-dropout branches ride the precomputed ``ops.x_agg`` gather-free.
    hoist_first: bool = False
    # channel-projection GEMM operand dtype (ACMConv/MLPBlock.gemm_dtype;
    # "bfloat16" = MXU-native operands, f32 accumulation)
    gemm_dtype: Optional[str] = None

    def _conv(
        self, out_features: int, name: str, input_hoist: bool = False
    ) -> ACMConv:
        return ACMConv(
            out_features=out_features,
            model_type=self.model_type,
            variant=self.variant,
            structure_info=self.structure_info,
            use_layernorm=self.use_layernorm,
            nnodes=self.nnodes,
            input_hoist=input_hoist,
            gemm_dtype=self.gemm_dtype,
            name=name,
        )

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        ops: Operators,
        *,
        training: bool = False,
        paired_eval: bool = False,
    ):
        """Model forward.

        ``paired_eval=True`` additionally produces the deterministic
        (no-dropout) eval logits in the SAME pass, sharing every sparse
        gather with the train branch (see the joint training loop in
        acmgnn_tpu/train/trainer.py).  Returns ``(train_logits,
        eval_logits)``; supported for the 2-layer ACM stacks.
        """
        if self.model_type not in MODEL_TYPES:
            raise ValueError(f"unknown model_type: {self.model_type!r}")
        if paired_eval and self.model_type not in (
            "acmgcn", "acmgcnp", "acmgcnpp"
        ):
            raise ValueError(
                f"paired_eval unsupported for {self.model_type!r}"
            )

        drop = lambda h: nn.Dropout(rate=self.dropout, deterministic=not training)(h)

        x_eval = x if paired_eval else None
        if self.model_type in _ACM_FAMILY:
            x = drop(x)

        if self.model_type == "acmgcnpp":
            mlp_mod = MLPBlock(
                hidden_channels=self.nhid,
                out_channels=self.nhid,
                num_layers=self.init_layers_X,
                dropout=0.0,
                gemm_dtype=self.gemm_dtype,
                name="mlpX",
            )
            mlp_x = mlp_mod(x, training=training)
            xx = drop(jax.nn.relu(mlp_x))
            if paired_eval:
                xx_eval = jax.nn.relu(mlp_mod(x_eval, training=False))

        # ACM-family inputs were dropout'd above: their precomputed
        # aggregate is valid only when dropout is a no-op.  Non-ACM
        # stacks (gcn/sgc/snowball) feed raw X — always valid.
        agg0 = ops.x_agg if self.hoist_first else None
        pre_dropped = self.model_type in _ACM_FAMILY
        train_agg = (
            agg0
            if (not pre_dropped or self.dropout == 0.0 or not training)
            else None
        )

        if self.model_type in ("acmsnowball", "snowball"):
            # densely-concatenated snowball stacking; only block 0 sees
            # the raw features, so only it can hoist
            blocks = []
            for k in range(self.nlayers):
                inp = jnp.concatenate([x] + blocks, axis=1) if blocks else x
                out = self._conv(
                    self.nhid, f"gcn_{k}",
                    input_hoist=self.hoist_first and k == 0,
                )(inp, ops, x_agg=train_agg if k == 0 else None)
                blocks.append(drop(jax.nn.relu(out)))
            final_in = jnp.concatenate([x] + blocks, axis=1)
            return self._conv(self.nclass, f"gcn_{self.nlayers}")(final_in, ops)

        if self.model_type in ("acmsgc", "sgc"):
            # sgc only: ops.adj_low is already A_hat^k, so the hoisted
            # aggregate is A_hat^k X (acmsgc's split low/high operators
            # don't hoist)
            hoist_sgc = self.hoist_first and self.model_type == "sgc"
            return self._conv(
                self.nclass, "gcn_0", input_hoist=hoist_sgc
            )(x, ops, x_agg=train_agg if hoist_sgc else None)

        if self.model_type == "graphsage":
            fea1 = drop(jax.nn.relu(SAGEConv(self.nhid, name="sage_0")(x, ops)))
            return SAGEConv(self.nclass, name="sage_1")(fea1, ops)

        if self.model_type == "gcnII":
            h = drop(x)
            h = jax.nn.relu(nn.Dense(self.nhid, name="fc_in")(h))
            h0 = h
            for l in range(1, max(self.nlayers, 1) + 1):
                h = drop(h)
                h = jax.nn.relu(
                    GCNIIConv(
                        self.nhid,
                        layer_index=l,
                        alpha=self.alpha,
                        lamda=self.lamda,
                        name=f"gcnII_{l}",
                    )(h, h0, ops)
                )
            return nn.Dense(self.nclass, name="fc_out")(drop(h))

        # 2-layer stacks: acmgcn / acmgcnp / acmgcnpp / acmgraphsage /
        # gcn / mlp
        conv0 = self._conv(self.nhid, "gcn_0", input_hoist=self.hoist_first)
        conv1 = self._conv(self.nclass, "gcn_1")
        if paired_eval:
            # the eval branch's layer-1 input is the raw feature matrix
            # -> its precomputed aggregate is always valid
            fea1, fea1_eval = conv0(
                x, ops, x_eval=x_eval, x_agg=train_agg, x_eval_agg=agg0
            )
            fea1 = drop(jax.nn.relu(fea1))
            fea1_eval = jax.nn.relu(fea1_eval)
            if self.model_type == "acmgcnpp":
                fea1 = fea1 + xx
                fea1_eval = fea1_eval + xx_eval
            return conv1(fea1, ops, x_eval=fea1_eval)
        fea1 = conv0(x, ops, x_agg=train_agg)
        fea1 = drop(jax.nn.relu(fea1))
        if self.model_type == "acmgcnpp":
            fea1 = fea1 + xx
        return conv1(fea1, ops)
