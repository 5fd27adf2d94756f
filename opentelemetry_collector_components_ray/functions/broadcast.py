"""Per-process state cache for stateless ``map_batches`` stages.

Two ways to amortize per-stage state in Ray Data:

1. **Actor pool** (callable class + ``concurrency=``): right when the
   state is genuinely expensive (a model, a codec, a big parser
   table).  Costs: lazy pool ramp-up serializes fused upstream stages
   behind actor starts, and Ray Data ``ray.put``'s the transformer for
   actor ctors, which trips the core-worker "constructor arguments in
   the object store and max_restarts > 0" warning on every pool
   (ray-project/ray#53727) — pure noise at our state sizes.
2. **Stateless task + process cache** (this module): the task function
   rebuilds-or-fetches its state from a module-global dict keyed by
   the stage's parameters — built once per worker PROCESS (same
   amortization as an actor), scheduled as ordinary tasks (elastic,
   fusable, no pool, no warning).  Broadcast ``ray.put`` refs work the
   same way: capture the ref in the closure, ``ray.get`` it inside the
   builder — the object-store copy is node-local after the first get.

The engine uses (2) for cheap state (hash params, broadcast matrices,
lookup tables) and keeps (1) for the multimodal codec stages where an
actor is the honest shape.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Hashable

_PROCESS_CACHE: Dict[Hashable, Any] = {}


def process_cached(key: Hashable, builder: Callable[[], Any]) -> Any:
    """Return the per-process singleton for ``key``, building it on
    first use in each worker process."""
    v = _PROCESS_CACHE.get(key)
    if v is None:
        v = _PROCESS_CACHE[key] = builder()
    return v
