"""Profiling helpers — the TPU-native upgrade of the reference's wall-clock
``io_time/prepare_time/forward_time`` counters (``train_*:1096-1101``).

``phase_timer`` accumulates per-phase wall time with an explicit fetch-based
device sync (``block_until_ready`` does not synchronize through this
environment's TPU relay — see .claude/skills/verify/SKILL.md), and
``trace`` wraps ``jax.profiler`` for real XLA traces viewable in
TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax
import numpy as np


def device_sync(x=None):
    """Force completion of outstanding device work by fetching a scalar."""
    if x is not None:
        leaf = jax.tree_util.tree_leaves(x)
        if leaf:
            np.asarray(jax.device_get(leaf[0].ravel()[0] if hasattr(leaf[0], "ravel") else leaf[0]))
            return
    # fallback: round-trip a trivial computation
    np.asarray(jax.numpy.zeros(()))


class PhaseTimer:
    """Accumulate wall time per named phase; report averages."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync_on=None):
        t0 = time.time()
        try:
            yield
        finally:
            if sync_on is not None:
                device_sync(sync_on)
            self.totals[name] += time.time() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, float]:
        return {k: self.totals[k] / max(self.counts[k], 1) for k in self.totals}


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context (open the logdir in TensorBoard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
