"""Analytic matmul/conv FLOP counting by jaxpr traversal.

``jaxpr_flops(fn, *args)`` traces ``fn`` (host-only — no compile, no device)
and counts 2·M·N·K for every ``dot_general`` and the exact
2·|out|·k_h·k_w·C_in/groups for every ``conv_general_dilated``, recursing
through ``pjit``/``scan`` (×length)/``cond`` (max of branches)/custom-VJP
calls and into **Pallas kernels** (kernel-body FLOPs × grid size — the
streamed flash kernels are loop-free, so the grid product is the exact
multiplier). Elementwise/reduction FLOPs are ignored by design: on TPU the
MXU term is what an MFU number should be normalized by.

Used by ``bench.py`` to emit an ``mfu`` field in the driver artifact
(VERDICT r4 #4) and by the training benchmarks for per-step MFU. The
reference has no FLOP accounting anywhere; the closest public practice is
the HLO cost analysis this mirrors.

Caveats (documented, conservative): ``while_loop`` bodies are counted once
(trip counts are not static; the framework's hot paths use ``lax.scan``,
which carries its length); ``cond`` takes the max branch (an upper bound).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import numpy as np


def _prod(xs) -> int:
    out = 1
    for x in xs:
        out *= int(x)
    return out


def _dot_general_flops(eqn) -> int:
    (lhs_c, rhs_c), (lhs_b, rhs_b) = eqn.params["dimension_numbers"]
    lhs = eqn.invars[0].aval.shape
    rhs = eqn.invars[1].aval.shape
    batch = _prod(lhs[i] for i in lhs_b)
    contract = _prod(lhs[i] for i in lhs_c)
    m = _prod(d for i, d in enumerate(lhs) if i not in set(lhs_b) | set(lhs_c))
    n = _prod(d for i, d in enumerate(rhs) if i not in set(rhs_b) | set(rhs_c))
    return 2 * batch * m * n * contract


def _conv_flops(eqn) -> int:
    dn = eqn.params["dimension_numbers"]
    rhs = eqn.invars[1].aval.shape
    out = eqn.outvars[0].aval.shape
    k_spatial = _prod(rhs[i] for i in dn.rhs_spec[2:])
    # the kernel's input-channel dim is already per-group, so groups need no
    # further correction: each output element contracts k_spatial·c_in_group
    c_in_group = rhs[dn.rhs_spec[1]]
    return 2 * _prod(out) * k_spatial * c_in_group


def _jaxpr_obj(x):
    """Unwrap ClosedJaxpr → Jaxpr; pass Jaxpr through; else None."""
    if hasattr(x, "jaxpr") and hasattr(x, "consts"):
        return x.jaxpr
    if hasattr(x, "eqns") and hasattr(x, "invars"):
        return x
    return None


def count_jaxpr(jaxpr) -> int:
    """Matmul+conv FLOPs of one (possibly nested) jaxpr."""
    jaxpr = _jaxpr_obj(jaxpr) or jaxpr
    total = 0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            total += _dot_general_flops(eqn)
        elif name == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif name == "scan":
            total += int(eqn.params["length"]) * count_jaxpr(eqn.params["jaxpr"])
        elif name == "cond":
            total += max(count_jaxpr(b) for b in eqn.params["branches"])
        elif name == "while":
            # trip count is dynamic: count one body iteration (documented)
            total += count_jaxpr(eqn.params["body_jaxpr"])
        elif name == "pallas_call":
            grid = 1
            gm = eqn.params.get("grid_mapping")
            if gm is not None and getattr(gm, "grid", None):
                grid = _prod(int(g) for g in gm.grid if isinstance(g, (int, np.integer)))
            total += grid * count_jaxpr(eqn.params["jaxpr"])
        else:
            # generic recursion: any param that holds a jaxpr (pjit, remat,
            # custom_vjp/jvp calls, closed_call, shard_map, ...)
            for v in eqn.params.values():
                sub = _jaxpr_obj(v)
                if sub is not None:
                    total += count_jaxpr(sub)
                elif isinstance(v, (tuple, list)):
                    for vv in v:
                        sub = _jaxpr_obj(vv)
                        if sub is not None:
                            total += count_jaxpr(sub)
    return total


def jaxpr_flops(fn, *args, **kwargs) -> int:
    """Total matmul/conv FLOPs of ``fn(*args, **kwargs)`` (trace-only)."""
    closed = jax.make_jaxpr(fn)(*args, **kwargs)
    return count_jaxpr(closed)
