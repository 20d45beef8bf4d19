"""Model cost reporting and profiling.

Replaces the reference's ptflops MAC/param prints at model init
(interfaces/base.py:372-381, 638-643, 684-689) with XLA's own cost analysis
(``jit(...).lower().compile().cost_analysis()``) — exact for the compiled
graph rather than a per-module estimate — plus a ``jax.profiler`` trace
context (SURVEY.md §5 "tracing/profiling").
"""

from __future__ import annotations

import contextlib
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import numpy as np


def param_count(tree: Any) -> int:
    return sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(tree))


def cost_analysis(fn: Callable, *example_args) -> Dict[str, float]:
    """Compile ``fn`` and return XLA's cost analysis (flops, bytes accessed).

    Returns {} when the backend doesn't expose cost analysis.
    """
    compiled = jax.jit(fn).lower(*example_args).compile()
    try:
        ca = compiled.cost_analysis()
    except Exception:
        return {}
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    return dict(ca or {})


def model_cost_report(
    model, variables, example_inputs: Tuple[Any, ...], name: str = "model"
) -> Dict[str, float]:
    """Print a ptflops-style summary for a flax module's inference pass.

    Mirrors the reference's per-module complexity print:
      ``<name>: <G>flops <M>params`` (base.py:376-381 prints MACs; XLA
      reports FLOPs ≈ 2x MACs for matmul/conv-dominated graphs).
    """
    n_params = param_count(variables.get("params", variables))

    def fwd(v, *inp):
        return model.apply(v, *inp, train=False)

    ca = cost_analysis(fwd, variables, *example_inputs)
    flops = float(ca.get("flops", 0.0))
    print(f"::::: {name}: {flops / 1e9:.4f} GFLOPs, {n_params / 1e6:.4f} M params")
    return {"flops": flops, "params": float(n_params), **ca}


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/jax-trace"):
    """``jax.profiler`` trace context; view with tensorboard or xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
