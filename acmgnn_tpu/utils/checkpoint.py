"""Checkpoint / resume — a capability the reference lacks entirely
(SURVEY.md §5: model selection there only snapshots the test *number*,
never weights).  Thin orbax wrapper storing flax variables + opt state +
step metadata, multi-host safe.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, variables: Any, opt_state: Any = None,
                    step: int = 0, extra: Optional[dict] = None):
    """Save a training snapshot; overwrites any existing one at ``path``."""
    import orbax.checkpoint as ocp

    payload = {"variables": variables, "step": step}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    if extra:
        payload["extra"] = extra
    p = Path(path).absolute()
    ckptr = _checkpointer()
    ckptr.save(p, payload, force=True)
    return str(p)


def restore_checkpoint(path: str, template: Optional[Any] = None) -> dict:
    """Restore a snapshot; ``template`` (same pytree structure) restores
    exact array types/shardings when provided."""
    p = Path(path).absolute()
    ckptr = _checkpointer()
    if template is not None:
        import orbax.checkpoint as ocp

        return ckptr.restore(p, item=template)
    return ckptr.restore(p)
