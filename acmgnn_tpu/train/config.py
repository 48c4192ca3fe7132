"""Unified training configuration.

One dataclass replaces the reference's three diverging argparse systems
(/root/reference/ACM-Pytorch/arg_parser.py:4-87,
/root/reference/ACM-Geometric/parse.py:16-58,
/root/reference/synthetic-experiments/arg_parser.py:4-95) — including their
spelling drift (``--dataset_name`` vs ``--dataset``, ``--model`` vs
``--method``, ``--hidden`` vs ``--hidden_channels``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass
class TrainConfig:
    # model
    model_type: str = "acmgcn"
    hidden: int = 64
    nlayers: int = 1                  # acmsnowball depth
    variant: bool = False             # ACMII
    structure_info: bool = False      # 4th structure channel
    use_layernorm: Optional[bool] = None  # None => per-pipeline default
    init_layers_X: int = 1            # acmgcnpp skip-MLP depth
    hops: int = 1                     # acmsgc k-hop
    alpha: float = 0.1                # gcnII initial-residual strength
    lamda: float = 0.5                # gcnII identity-map decay

    # optimization
    lr: float = 0.05
    weight_decay: float = 5e-4
    dropout: float = 0.5
    epochs: int = 1000
    early_stopping: int = 200         # 0 disables; mean-val-loss window
    optimizer: str = "adam"           # "adam" (torch-style L2) | "adamw"

    # protocol
    selection: str = "val_loss"       # "val_loss" | "val_metric"
    metric: str = "acc"               # "acc" | "rocauc"
    loss: str = "nll"                 # "nll" | "bce"
    num_splits: int = 10
    fixed_splits: bool = False        # bundled Geom-GCN .npz masks
    directed: bool = False            # skip edge symmetrization (LINKX)
    sub_dataset: str = ""             # twitch-e lang / fb100 school
    seed: int = 42

    # data/operators
    normalization: str = "row"        # low-pass normalization
    operator_format: str = "auto"     # "auto" | "dense" | "coo" | "ell"
    spmm_dtype: str = "float32"       # "bfloat16": halve ELL gather traffic
    # channel-projection GEMM operand dtype: "bfloat16" runs the X·W
    # projections (and the acmgcnpp skip-MLP) with MXU-native bf16
    # operands + float32 accumulation — the lever for GEMM-bound
    # wide-feature regimes (Penn94 F=4814).  Attention GEMMs stay f32.
    gemm_dtype: str = "float32"       # "float32" | "bfloat16"
    reorder: str = "none"             # "rcm"|"degree": gather-locality perm
    # multi-chip row partition: "contiguous" (nnz-balanced blocks),
    # "fennel" (streaming min-cut-ish, parallel/partition.py — shrinks
    # the halo exchange volume on community-structured graphs), or
    # "balanced" (serpentine-by-degree — balances hub/class-padding
    # work on heavy-tailed graphs under SPMD-uniform planes)
    partition: str = "contiguous"
    # ELL dense-row hybrid: rows with degree >= this become one MXU
    # matmul block instead of per-edge gather descriptors (pays off on
    # power-law hub nodes; measured 4.5x at twitch scale).
    # 0 = auto (2048), negative = off.
    ell_hub_threshold: int = 0
    # ELL block-column layout: one gather slot addresses this many
    # adjacent columns.  0 = unset (ACMGNN_ELL_BLOCK env, default 1/off
    # — measured slower on the current TPU backend even on
    # high-occupancy banded graphs: the gather engine's full descriptor
    # rate only holds for <=128-column operands; see PERF.md).
    # -1 = occupancy-based auto, >=1 = force.
    ell_block: int = 0
    # joint paired train+eval loop: epoch k's train forward and epoch
    # k-1's eval forward ride ONE 4-wide fused gather.  Pays off when the
    # gather stays descriptor-bound (spmm_dtype=bfloat16 keeps the 4-wide
    # rows at 512B); exactly equivalent to the sequential loop (tested).
    # Falls back to sequential for model types without a paired forward.
    joint: bool = False
    # first-layer input-side aggregation hoist (variant-0 ACM stacks):
    # layer 1 exploits ``A_hat (X W) == (A_hat X) W`` to aggregate its
    # INPUT instead of its projections — the eval forward consumes a
    # once-precomputed ``A_hat X`` with ZERO sparse gathers, and the
    # train forward's input gather needs no backward transpose (inputs
    # are data).  Mathematically exact; float association differs.
    hoist_first: bool = False
    # dtype of the precomputed ``A_hat X`` hoist aggregate.  "auto" keeps
    # float32 except in the wide-feature + bf16-gather regime where the
    # [N, F] float32 aggregate alone is >1 GiB (wiki-2M: 4.6 GB) — there
    # it follows ``spmm_dtype`` down to bfloat16, halving its HBM
    # residency.  Narrow/small graphs keep exact f32 (recorded parity
    # numbers unchanged).
    hoist_agg_dtype: str = "auto"     # "auto" | "float32" | "bfloat16"
    # rematerialize the train forward during the backward pass
    # (jax.checkpoint): activation temps are recomputed instead of held
    # live across the backward — the standard TPU lever trading FLOPs
    # (and gather passes) for HBM at full-graph scale (wiki-2M joint
    # training exceeds one chip's HBM without it).  Exact same math.
    remat: bool = False
    # on-device storage dtype of the [N, F] feature matrix — the largest
    # argument at wiki-2M scale (f32: 4.6 GB).  "bfloat16" halves it;
    # weights, accumulations and outputs stay float32 (only the input is
    # quantized).  Combined with remat this fits wiki-2M full-batch
    # training on one 16 GB chip.
    feature_dtype: str = "float32"    # "float32" | "bfloat16"
    feature_normalize: Optional[bool] = None  # None => reference rule

    def resolve_layernorm(self) -> bool:
        """LN-pre-attention default: live for acmgcnp/pp (the
        ACM-Geometric behavior and the intended design — in ACM-Pytorch
        the branch is dead code due to a string mismatch; SURVEY.md
        §2.10)."""
        if self.use_layernorm is not None:
            return self.use_layernorm
        return self.model_type in ("acmgcnp", "acmgcnpp")

    def resolve_hoist(self) -> bool:
        """Hoisting applies only to variant-0 layer-1s whose input is the
        feature matrix — the ACM stacks with a propagating first layer,
        plus the plain gcn/sgc/snowball baselines (raw-X inputs)."""
        return (
            self.hoist_first
            and not self.variant
            and self.model_type
            in ("acmgcn", "acmgcnp", "acmgcnpp", "acmsnowball",
                "gcn", "sgc", "snowball")
        )

    def resolve_hoist_agg_dtype(self, num_nodes: int, num_features: int):
        """Storage dtype for the precomputed hoist aggregate (see the
        ``hoist_agg_dtype`` field).  Returns a numpy-compatible dtype
        object (jnp dtype) or None for float32/no-cast."""
        import jax.numpy as jnp

        if self.hoist_agg_dtype == "bfloat16":
            return jnp.bfloat16
        if self.hoist_agg_dtype == "float32":
            return None
        if self.hoist_agg_dtype != "auto":
            raise ValueError(
                f"unknown hoist_agg_dtype {self.hoist_agg_dtype!r}"
            )
        from acmgnn_tpu.models.layers import HOIST_MAX_COLS

        if (
            self.spmm_dtype == "bfloat16"
            and num_features > HOIST_MAX_COLS
            and 4 * num_nodes * num_features > 2**30
        ):
            return jnp.bfloat16
        return None

    def resolve_for_dataset(self, dataset_name: str) -> "TrainConfig":
        """Dataset-conditional protocol switches the reference hard-codes.

        deezer-europe is forced to AdamW + 500 epochs + dataset-attached
        fixed splits + best-val-accuracy selection, overriding whatever
        the flags said — exactly what the reference's train loop does
        unconditionally (/root/reference/ACM-Pytorch/train.py:63-82:
        ``args.epochs = 500``, ``torch.optim.AdamW``, ``split_idx_lst``
        indexing regardless of ``--fixed_splits``)."""
        if dataset_name == "deezer-europe":
            return dataclasses.replace(
                self,
                optimizer="adamw",
                epochs=500,
                fixed_splits=True,
                selection="val_metric",
            )
        return self

    def resolve_feature_normalize(self) -> bool:
        """Features are row-normalized unless acmgcnp/pp with
        structure_info (/root/reference/ACM-Pytorch/utils.py:612-617)."""
        if self.feature_normalize is not None:
            return self.feature_normalize
        return not (
            self.model_type in ("acmgcnp", "acmgcnpp") and self.structure_info
        )
