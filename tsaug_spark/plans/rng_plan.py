"""Driver-side RNG-parity planner + scripted replay generator.

The reference draws all randomness from two ``RandomState(seed)`` streams
per call — a selection stream and a core stream — over the *whole batch*
of N series (SURVEY.md §3.3, §7.2).  To run the same operator per
conversation group on executors without breaking bit-exactness, the
driver replays both batch streams here, slices every draw into its
per-(series, repeat) pieces, and ships each group a small queue of
pre-drawn arrays.  On the executor the operator's unmodified ``_core``
runs with a :class:`ScriptedRNG` that pops those arrays in call order —
the exact code path, the exact floats.

Planning cost is O(total draws) on the driver — fine for parity testing
and for parameter-sized draws (sizes, levels, window types, crop starts).
The per-point blocks (AddNoise noise, Dropout masks) are O(N*T*C); at
benchmark/production scale use ``mode='subseed'`` in plans.pack, which
derives an independent per-(series, repeat) seed from
``xxhash(seed, conv_id, rep)`` — self-consistent and deterministic but
not reference-bit-exact (SURVEY.md §7.2).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from tsaug_spark.operators import (
    AddNoise,
    Convolve,
    Crop,
    Drift,
    Dropout,
    Pool,
    Quantize,
    Resize,
    Reverse,
    SeriesOp,
    TimeWarp,
)
from tsaug_spark.operators.base import expand_int_spec

#: queue of pre-drawn arrays for one (series, repeat) group
DrawQueue = List[np.ndarray]


class ScriptedRNG:
    """A RandomState stand-in that replays a planned draw queue.

    Each distribution method pops the next planned array, asserts the
    element count matches the request, and reshapes.  Supports exactly
    the methods the operator cores call.
    """

    def __init__(self, queue: DrawQueue):
        self._queue = list(queue)

    def _pop(self, size) -> np.ndarray:
        if not self._queue:
            raise RuntimeError("ScriptedRNG queue exhausted")
        arr = np.asarray(self._queue.pop(0))
        if size is None:
            if arr.size != 1:
                raise RuntimeError(
                    f"planned draw has {arr.size} elements, scalar requested"
                )
            return arr.reshape(()).item()
        want = int(np.prod(size))
        if arr.size != want:
            raise RuntimeError(
                f"planned draw has {arr.size} elements, {want} requested"
            )
        return arr.reshape(size)

    def uniform(self, low=0.0, high=1.0, size=None):
        return self._pop(size)

    def normal(self, loc=0.0, scale=1.0, size=None):
        return self._pop(size)

    def laplace(self, loc=0.0, scale=1.0, size=None):
        return self._pop(size)

    def choice(self, a, size=None):
        return self._pop(size)


class GroupPlan:
    """Planned execution for one (series, repeat) output row."""

    __slots__ = ("selected", "queue")

    def __init__(self, selected: bool, queue: DrawQueue):
        self.selected = selected
        self.queue = queue


def _selection(op: SeriesOp, N: int) -> np.ndarray:
    """Replay the base-class selection stream (base.py:238-242)."""
    rng = np.random.RandomState(op.seed)
    return rng.uniform(size=op.repeats * N) <= op.prob


def _chosen_layout(chosen: np.ndarray, N: int, repeats: int):
    """Map output row q = i*repeats + r -> its rank among chosen rows."""
    rank = np.cumsum(chosen) - 1
    return {q: int(rank[q]) for q in range(N * repeats) if chosen[q]}


def plan_operator(op: SeriesOp, N: int, T: int, C: int) -> List[GroupPlan]:
    """Replay the batch streams for ``op`` on an (N, T, C) input.

    Returns one GroupPlan per output row in series-major order
    (q = series_pos * repeats + rep_idx).  The queue contents follow the
    N=1 call sequence of each operator's core so a ScriptedRNG replays
    them in place of the core's own RandomState.
    """
    if isinstance(op, (Crop, Resize)):
        return _plan_override_ops(op, N, T, C)

    chosen = _selection(op, N)
    pos_of = _chosen_layout(chosen, N, op.repeats)
    M = int(chosen.sum())
    rng = np.random.RandomState(op.seed)
    queues: Dict[int, DrawQueue] = {q: [] for q in pos_of}

    if M > 0:
        if isinstance(op, Pool):
            block = op.plan_block_sizes(rng, M, C)
            for q, p in pos_of.items():
                if op.per_channel:
                    queues[q].append(block[p * C : (p + 1) * C])
                else:
                    queues[q].append(block[p * C : p * C + 1])
        elif isinstance(op, Quantize):
            if not isinstance(op.n_levels, int):
                levels = op.plan_levels(rng, M, C)
                for q, p in pos_of.items():
                    if op.per_channel:
                        queues[q].append(levels[p, :, :])
                    else:
                        queues[q].append(levels[p, :, :1])
        elif isinstance(op, Dropout):
            groups = M * C if op.per_channel else M
            if not isinstance(op.p, (float, int)):
                rate = op.plan_rates(rng, M, C)
            else:
                rate = None
            sizes = expand_int_spec(op.size)
            masks = []
            for s in sizes:
                if op.per_channel:
                    masks.append(rng.uniform(size=(M * C, T - s)))
                else:
                    masks.append(rng.uniform(size=(M, T - s)))
            for q, p in pos_of.items():
                if rate is not None:
                    if op.per_channel:
                        queues[q].append(rate[p * C : (p + 1) * C])
                    else:
                        queues[q].append(rate[p : p + 1])
                for k in range(len(sizes)):
                    if op.per_channel:
                        queues[q].append(masks[k][p * C : (p + 1) * C, :])
                    else:
                        queues[q].append(masks[k][p : p + 1, :])
        elif isinstance(op, AddNoise):
            # draw order: loc, scale, then the (M, T, C|1) noise block
            loc = scale = None
            if not isinstance(op.loc, (float, int)):
                loc = op._draw_param(rng, op.loc, M)
            if not isinstance(op.scale, (float, int)):
                scale = op._draw_param(rng, op.scale, M)
            if op.distr == "gaussian":
                block = rng.normal(
                    0.0, 1.0, size=(M, T, C if op.per_channel else 1)
                )
            elif op.distr == "laplace":
                block = rng.laplace(
                    0.0, 1.0, size=(M, T, C if op.per_channel else 1)
                )
            else:
                r3 = 3 ** 0.5
                block = rng.uniform(
                    low=-r3, high=r3, size=(M, T, C if op.per_channel else 1)
                )
            for q, p in pos_of.items():
                if loc is not None:
                    queues[q].append(loc[p : p + 1])
                if scale is not None:
                    queues[q].append(scale[p : p + 1])
                queues[q].append(block[p])
        elif isinstance(op, Convolve):
            if isinstance(op.window, list):
                if op.per_channel:
                    tpick = rng.choice(len(op.window), M * C)
                else:
                    tpick = rng.choice(len(op.window), M)
            else:
                tpick = None
            if not isinstance(op.size, int):
                pool = (
                    range(op.size[0], op.size[1])
                    if isinstance(op.size, tuple)
                    else op.size
                )
                if op.per_channel:
                    spick = rng.choice(pool, M * C)
                else:
                    spick = rng.choice(pool, M)
            else:
                spick = None
            for q, p in pos_of.items():
                if tpick is not None:
                    if op.per_channel:
                        queues[q].append(tpick[p * C : (p + 1) * C])
                    else:
                        queues[q].append(tpick[p : p + 1])
                if spick is not None:
                    if op.per_channel:
                        queues[q].append(spick[p * C : (p + 1) * C])
                    else:
                        queues[q].append(spick[p : p + 1])
        elif isinstance(op, Drift):
            distinct = (
                set([op.n_drift_points])
                if isinstance(op.n_drift_points, int)
                else set(op.n_drift_points)
            )
            width = C if op.per_channel else 1
            assign = rng.choice(len(distinct), M * width)
            anchor_rows: Dict[int, np.ndarray] = {}
            owners: Dict[int, np.ndarray] = {}
            for i, n in enumerate(distinct):
                members = assign == i
                if members.any():
                    anchor_rows[i] = rng.normal(
                        size=(int(members.sum()), n + 2)
                    )
                    owners[i] = np.flatnonzero(members)
            if not isinstance(op.max_drift, (float, int)):
                maxd = rng.uniform(
                    low=op.max_drift[0],
                    high=op.max_drift[1],
                    size=(M, 1, width),
                )
            else:
                maxd = None
            for q, p in pos_of.items():
                lo, hi = p * width, (p + 1) * width
                queues[q].append(assign[lo:hi])
                for i, n in enumerate(distinct):
                    if i not in anchor_rows:
                        continue
                    mine = (owners[i] >= lo) & (owners[i] < hi)
                    if mine.any():
                        queues[q].append(anchor_rows[i][mine, :])
                if maxd is not None:
                    queues[q].append(maxd[p])
        elif isinstance(op, TimeWarp):
            if isinstance(op.max_speed_ratio, tuple):
                ratio = rng.uniform(
                    low=op.max_speed_ratio[0],
                    high=op.max_speed_ratio[1],
                    size=M,
                )
            elif isinstance(op.max_speed_ratio, list):
                ratio = rng.choice(op.max_speed_ratio, size=M)
            else:
                ratio = None
            vals = rng.uniform(
                low=0.0, high=1.0, size=(M, op.n_speed_change + 1)
            )
            for q, p in pos_of.items():
                if ratio is not None:
                    queues[q].append(ratio[p : p + 1])
                queues[q].append(vals[p : p + 1, :])
        elif isinstance(op, Reverse):
            pass  # no core draws
        else:
            raise NotImplementedError(
                f"no planner for operator {type(op).__name__}"
            )

    return [
        GroupPlan(bool(chosen[q]), queues.get(q, []))
        for q in range(N * op.repeats)
    ]


def _plan_override_ops(op: SeriesOp, N: int, T: int, C: int) -> List[GroupPlan]:
    """Crop and Resize bypass the repeat/select wrapper (their _apply
    overrides) — replay their dedicated draw sequences."""
    rng = np.random.RandomState(op.seed)
    rows = N * op.repeats

    if isinstance(op, Resize):
        # only draw: the prob gate, legal only for N==1, repeats==1
        if op.prob != 1.0:
            gate = rng.uniform()
            return [GroupPlan(gate <= op.prob, [])]
        return [GroupPlan(True, []) for _ in range(rows)]

    assert isinstance(op, Crop)
    plans: List[Optional[GroupPlan]] = [None] * rows
    if op.prob != 1.0:
        gate = rng.uniform()
        if gate > op.prob:
            return [GroupPlan(False, [])]
    candidates = expand_int_spec(op.size)
    crop_len = rng.choice(candidates, size=rows)
    for s in np.unique(crop_len):
        rows_with_s = np.flatnonzero(crop_len == s)
        starts = rng.choice(T - s + 1, size=len(rows_with_s))
        for k, q in enumerate(rows_with_s):
            plans[q] = GroupPlan(
                True, [np.array([s]), np.array([starts[k]])]
            )
    return [p if p is not None else GroupPlan(True, []) for p in plans]


def subseed_for(seed: Optional[int], conv_id: str, rep: int) -> int:
    """Deterministic per-(series, repeat) sub-seed for scalable mode."""
    base = 0 if seed is None else int(seed)
    h = np.uint64(14695981039346656037)
    for ch in f"{base}|{conv_id}|{rep}":
        h = np.uint64((int(h) ^ ord(ch)) * 1099511628211 % (1 << 64))
    return int(h % np.uint64(2 ** 31 - 1))


class PositionalRNG:
    """Deterministic, STATELESS RandomState stand-in.

    ``uniform(size=...)`` / ``normal`` / ``choice`` yield position-hash
    values ``u_j = ((j*17 + 7) % 100) / 100`` over the FLAT element
    position j (row-major); scalar ``uniform()`` returns ``low`` so
    prob-selection always selects.  Stateless: every call restarts at
    position 0, so a generator replaying the same call sequence (e.g.
    an oracle-SQL builder on the driver) sees the same stream.

    Purpose: run an RNG-bearing kernel (Dropout masks, AddNoise draws,
    TimeWarp/Drift anchors) under draws a SQL oracle can replay exactly
    — pure integer arithmetic on positions, identical in Python and
    SQL (or foldable to static per-position constants).  Inject via the
    ``rng_factory`` hook on an operator (plans/pack.py).
    """

    @staticmethod
    def _u(shape):
        n = int(np.prod(shape))
        j = np.arange(n)
        return (((j * 17 + 7) % 100) / 100.0).reshape(shape)

    def uniform(self, low=0.0, high=1.0, size=None):
        if size is None:
            return low
        shape = size if isinstance(size, tuple) else (int(size),)
        return low + (high - low) * self._u(shape)

    def normal(self, loc=0.0, scale=1.0, size=None):
        shape = size if isinstance(size, tuple) else (int(size),)
        return loc + scale * (self._u(shape) - 0.5) * 2.0

    def choice(self, a, size=None):
        n_opts = int(a) if isinstance(a, (int, np.integer)) else len(a)
        if size is None:
            shape = ()
        elif isinstance(size, tuple):
            shape = size
        else:
            shape = (int(size),)
        idx = (np.arange(int(np.prod(shape))) % n_opts).reshape(shape)
        if isinstance(a, (int, np.integer)):
            return idx
        return np.asarray(a)[idx]
