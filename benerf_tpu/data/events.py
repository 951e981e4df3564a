"""Event-stream operations: windowing + polarity accumulation (ETA maps).

Reference behavior (/root/reference/model/nerf.py:160-205 and
utils/event_utils.py:246-276):
  - per train iteration a contiguous window of the normalized-time stream is
    selected, either by TIME (length accumulate_time_length, random placement)
    or by COUNT (round(num*alpha) events starting at a random index);
  - the window's polarities are scatter-added into an (H, W) "ETA" map;
  - the window's (start, end) timestamps parameterize the spline poses.

TPU-native design: the full (sorted) stream lives on device as fixed-size
arrays {pix_idx:int32, ts:f32, pol:f32}; the TIME window is a mask (no
dynamic shapes), and ETA is ONE fused segment-sum — replacing the reference's
per-iteration host->device sparse-COO round trip (event_utils.py:246-259).
The COUNT window uses a static-size dynamic_slice (round(num*alpha) is a
trace-time constant). Host-side preprocessing (sorting, pixel flattening)
happens once in `prepare`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class EventArrays(NamedTuple):
    """Device-resident, time-sorted event stream (normalized ts in [0,1])."""

    pix_idx: jax.Array  # (N,) int32 = y * W + x
    ts: jax.Array       # (N,) float32
    pol: jax.Array      # (N,) float32 (+-1 typically)

    @property
    def num(self) -> int:
        return self.pix_idx.shape[0]


def prepare(x, y, ts, pol, width: int) -> EventArrays:
    """Host-side: sort by time, flatten pixels. ts must already be in [0,1]."""
    x = np.asarray(x)
    y = np.asarray(y)
    ts = np.asarray(ts, np.float32)
    pol = np.asarray(pol, np.float32)
    order = np.argsort(ts, kind="stable")
    pix = (y.astype(np.int64) * width + x.astype(np.int64)).astype(np.int32)
    return EventArrays(
        pix_idx=jnp.asarray(pix[order]),
        ts=jnp.asarray(ts[order]),
        pol=jnp.asarray(pol[order]),
    )


def prepare_raw(x, y, t_raw, pol, width: int, t_lo: float, t_hi: float) -> EventArrays:
    """One-pass ingest of a RAW stream: crop to [t_lo, t_hi], normalize time
    to [0,1] over that range, flatten, time-sort — through the C++ engine
    (csrc/events.cpp) when built, numpy otherwise."""
    from benerf_tpu.data import _native

    pix, ts, pp = _native.prepare_events(x, y, t_raw, pol, width, t_lo, t_hi)
    return EventArrays(
        pix_idx=jnp.asarray(pix), ts=jnp.asarray(ts), pol=jnp.asarray(pp)
    )


def accumulate_all(events: EventArrays, hw: int):
    """Scatter-add every event's polarity into a flat (H*W,) map.

    Equivalent of accumulate_events / accumulate_events_on_gpu
    (event_utils.py:246-276) as one XLA segment-sum.
    """
    return jax.ops.segment_sum(events.pol, events.pix_idx, num_segments=hw)


def eta_time_window(events: EventArrays, hw: int, low_t, up_t,
                    cap: int = 0):
    """ETA map for the events with low_t <= ts <= up_t (inclusive ends,
    model/nerf.py:170-172).

    cap == 0: mask the full stream + one segment-sum (O(N); the scatter over
    the whole stream was the single hottest op in the step profile).
    cap > 0: exploit time-sortedness — searchsorted for the window start,
    dynamic_slice a fixed `cap` events, mask, scatter only those. Exact as
    long as no window holds more than `cap` events (see `window_cap`);
    returns (eta, overflow) where overflow counts silently dropped events
    (log it — nonzero means the cap was computed from the wrong stream).
    """
    if cap and cap < events.num:
        lo = jnp.searchsorted(events.ts, low_t, side="left")
        # dynamic_slice clamps lo to N-cap near the end; the ts >= low_t
        # mask then drops the extra leading events it pulled in.
        ts = jax.lax.dynamic_slice_in_dim(events.ts, lo, cap)
        pix = jax.lax.dynamic_slice_in_dim(events.pix_idx, lo, cap)
        pol = jax.lax.dynamic_slice_in_dim(events.pol, lo, cap)
        mask = (ts >= low_t) & (ts <= up_t)
        hi = jnp.searchsorted(events.ts, up_t, side="right")
        overflow = jnp.maximum(hi - lo - cap, 0)
    else:
        ts, pix, pol = events.ts, events.pix_idx, events.pol
        mask = (ts >= low_t) & (ts <= up_t)
        overflow = jnp.asarray(0, jnp.int32)
    eta = jax.ops.segment_sum(
        pol * mask.astype(pol.dtype), pix, num_segments=hw
    )
    return eta, overflow


def window_cap(ts_sorted, window_len: float, *, grid: int = 4096,
               safety: float = 1.10, round_to: int = 1024) -> int:
    """Static upper bound on events inside ANY time window of `window_len`.

    Host-side precompute for eta_time_window(cap=...). Windows start
    anywhere in [0, 1-window_len]; we bound the max by over-covering each
    grid cell by one grid spacing, then apply a safety factor and round up
    (keeps the compiled slice shape stable across scenes of similar size).
    """
    ts = np.asarray(ts_sorted)
    n = ts.shape[0]
    if n == 0 or window_len >= 1.0:
        return n
    lows = np.linspace(0.0, 1.0 - window_len, grid)
    delta = lows[1] - lows[0] if grid > 1 else 0.0
    lo = np.searchsorted(ts, lows, side="left")
    hi = np.searchsorted(ts, lows + window_len + delta, side="right")
    m = int((hi - lo).max()) if n else 0
    m = int(np.ceil(m * safety))
    m = ((m + round_to - 1) // round_to) * round_to
    return min(m, n)


def sample_time_window(key, window_len: float, random_placement: bool = True):
    """Pick the window [low, low+window_len] on the unit interval.

    random_placement=True:  low ~ U(0, 1-window_len)   (model/nerf.py:165-166)
    random_placement=False: low = k*window_len with k ~ U{0..(1-w)//w - 1}
                            (model/nerf.py:168-169)
    """
    if random_placement:
        low = jax.random.uniform(key) * (1.0 - window_len)
    else:
        n_slots = int((1.0 - window_len) // window_len)
        k = jax.random.randint(key, (), 0, max(n_slots, 1))
        low = k.astype(jnp.float32) * window_len
    up = jnp.minimum(low + window_len, 1.0)
    return low, up


def eta_count_window(events: EventArrays, hw: int, key, frac: float,
                     random_placement: bool = True):
    """COUNT-mode window: a contiguous slice of round(N*frac) events.

    Returns (eta, t_start, t_end). Static slice size -> no recompilation.
    Ref: model/nerf.py:179-191,205 (dead in shipped configs but part of the
    API surface).
    """
    n = events.num
    n_window = int(round(n * frac))
    if random_placement:
        start = jax.random.randint(key, (), 0, max(n - n_window, 1))
    else:
        n_slots = max((n - n_window) // max(n_window, 1), 1)
        k = jax.random.randint(key, (), 0, n_slots)
        start = k * n_window
    pix = jax.lax.dynamic_slice_in_dim(events.pix_idx, start, n_window)
    pol = jax.lax.dynamic_slice_in_dim(events.pol, start, n_window)
    ts = jax.lax.dynamic_slice_in_dim(events.ts, start, n_window)
    eta = jax.ops.segment_sum(pol, pix, num_segments=hw)
    return eta, ts[0], ts[n_window - 1]


class EventSlicer:
    """Time-window access into a TUM-VIE-format event h5 file.

    File layout: groups events/{p,x,y,t} plus an ms_to_idx array mapping
    milliseconds to event indices such that t[ms_to_idx[ms]] >= ms*1000 and
    t[ms_to_idx[ms]-1] < ms*1000, with optional t_offset
    (utils/event_utils.py:11-102). The reference refines the conservative
    ms-window with a numba binary scan (event_utils.py:104-162); we use
    searchsorted over the in-window slice (the C++ engine's time_window does
    the same for float arrays).
    """

    def __init__(self, h5f):
        self.h5f = h5f
        self.events = {k: h5f[f"events/{k}"] for k in ("p", "x", "y", "t")}
        self.ms_to_idx = np.asarray(h5f["ms_to_idx"], dtype="int64")
        self.t_offset = int(h5f["t_offset"][()]) if "t_offset" in h5f else 0
        self.t_final = int(self.events["t"][-1]) + self.t_offset

    def get_start_time_us(self) -> int:
        return self.t_offset

    def get_final_time_us(self) -> int:
        return self.t_final

    def ms2idx(self, t_ms: int):
        if t_ms < 0 or t_ms >= len(self.ms_to_idx):
            return None
        return int(self.ms_to_idx[t_ms])

    def get_events(self, t_start_us: int, t_end_us: int):
        """{p,x,y,t} arrays with t_start_us <= t < t_end_us, or None when
        the window leaves the recording."""
        assert t_start_us < t_end_us
        t_start_us -= self.t_offset
        t_end_us -= self.t_offset

        import math

        lo_ms = math.floor(t_start_us / 1000)
        hi_ms = math.ceil(t_end_us / 1000)
        lo_idx = self.ms2idx(lo_ms)
        hi_idx = self.ms2idx(hi_ms)
        if lo_idx is None or hi_idx is None:
            return None

        t_cons = np.asarray(self.events["t"][lo_idx:hi_idx])
        a = int(np.searchsorted(t_cons, t_start_us, side="left"))
        b = int(np.searchsorted(t_cons, t_end_us, side="left"))
        out = {"t": t_cons[a:b] + self.t_offset}
        for k in ("p", "x", "y"):
            out[k] = np.asarray(self.events[k][lo_idx + a : lo_idx + b])
        return out


def polarity_image(x, y, pol, height: int, width: int) -> np.ndarray:
    """(H, W, 3) uint8 visualization: positive events red, negative blue, on
    white — mirrors event_data_visualization (event_utils.py:228-244)."""
    img = np.full((height, width, 3), 255, np.uint8)
    x = np.asarray(x, np.int64)
    y = np.asarray(y, np.int64)
    pol = np.asarray(pol)
    pos = pol > 0
    img[y[pos], x[pos]] = (255, 0, 0)
    img[y[~pos], x[~pos]] = (0, 0, 255)
    return img


def accumulate_events_numpy(x, y, pol, height: int, width: int):
    """Host-side scatter-add oracle (tests + visualization).

    Mirrors accumulate_events_no_numba (event_utils.py:276-279).
    """
    out = np.zeros((height, width), np.float64)
    np.add.at(out, (np.asarray(y, np.int64), np.asarray(x, np.int64)), pol)
    return out
