"""Property-based tests (hypothesis) over the pure-python cores.

SURVEY.md §4 flags property tests as a build-strategy improvement over the
reference's three example scripts; these sweep what example-based tests
can't: arbitrary year ranges and window lengths for the splits
(reference ``fenhe_dataset_split.py:20-106`` semantics), arbitrary
missing-hour gap patterns for the ETL daily accumulation (reference
``cmorph.py:108-119``), arbitrary metric sequences for early stopping
(reference ``early_stopping.py:9-88``), and the ConvLSTM gate-math bounds.
"""
import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from pl_convlstm_gan_tpu.data.fenhe import days_in_year
from pl_convlstm_gan_tpu.data.splits import (split_dataset_random,
                                             year_indices)
from pl_convlstm_gan_tpu.tools.cmorph import daily_accumulations
from pl_convlstm_gan_tpu.train.early_stopping import EarlyStopping


class _FakeWindows:
    """Minimal map-style stand-in: the split math reads only these attrs."""

    def __init__(self, start_year, end_year, T):
        self.start_year, self.end_year, self.T = start_year, end_year, T
        self._days = sum(days_in_year(y) for y in range(start_year,
                                                        end_year + 1))

    def __len__(self):
        return self._days - self.T


@settings(deadline=None, max_examples=40)
@given(start=st.integers(1999, 2030), n_years=st.integers(1, 6),
       T=st.integers(1, 8))
def test_year_split_blocks_partition_and_stay_in_year(start, n_years, T):
    """Per-year index blocks are disjoint, in range, have the reference's
    exact drop-T sizes, and no window's days cross its year boundary."""
    end = start + n_years - 1
    ds = _FakeWindows(start, end, T)
    seen = set()
    cum = 0
    for y in range(start, end + 1):
        d = days_in_year(y)
        idx = year_indices(ds, y, y)
        assert idx == list(range(cum, cum + d - T))   # reference arithmetic
        assert not (seen & set(idx))                  # disjoint across years
        seen |= set(idx)
        # window [i, i+T-1] days all lie inside year y
        assert all(cum <= i and i + T - 1 < cum + d for i in idx)
        cum += d
    assert all(0 <= i < len(ds) for i in seen)
    assert len(seen) == sum(days_in_year(y) for y in range(start, end + 1)) \
        - T * n_years


@settings(deadline=None, max_examples=40)
@given(total=st.integers(3, 400), seed=st.integers(0, 2**31 - 1))
def test_random_split_is_a_seeded_partition(total, seed):
    """70/15/15 split partitions range(total) (disjoint + complete) and is
    deterministic in the seed."""
    data = list(range(total))
    tr, va, te = split_dataset_random(data, seed=seed)
    parts = [tr.indices, va.indices, te.indices]
    flat = [i for p in parts for i in p]
    assert sorted(flat) == data                       # complete + disjoint
    assert len(tr) == int(total * 0.7) and len(va) == int(total * 0.15)
    tr2, va2, te2 = split_dataset_random(data, seed=seed)
    assert (tr2.indices, va2.indices, te2.indices) == tuple(parts)


@settings(deadline=None, max_examples=25)
@given(st.data())
def test_daily_accumulation_gap_safety(data):
    """For an arbitrary missing-hour pattern, a day's accumulation equals the
    plain sum when ALL its source hours are present and NaN otherwise — for
    both systems (hydro: UTC day; cma 20-20: hours [D 12:00, D+1 12:00)).
    This is the gap-alignment fix over the reference's positional shift."""
    n_days = data.draw(st.integers(2, 4))
    n_hours = 24 * n_days
    drop = data.draw(st.sets(st.integers(0, n_hours - 1), max_size=30))
    keep = [i for i in range(n_hours) if i not in drop]
    if len(keep) < 2:
        return
    times = pd.date_range("2021-03-01", periods=n_hours, freq="h")[keep]
    rng = np.random.default_rng(data.draw(st.integers(0, 2**16)))
    vals = rng.random((len(keep), 1, 1)).astype(np.float64)

    out = daily_accumulations(vals, times, 2021)
    series = pd.Series(vals[:, 0, 0], index=times)
    for name, start_off in (("hydro_08-08", 0), ("cma_20-20", 12)):
        arr, days = out[name]
        for d, got in zip(days, arr[:, 0, 0]):
            w0 = d + pd.Timedelta(hours=start_off)
            hours = pd.date_range(w0, periods=24, freq="h")
            present = series.index.intersection(hours)
            if len(present) == 24:
                np.testing.assert_allclose(got, series[hours].sum(),
                                           rtol=1e-6)
            else:
                assert np.isnan(got), (name, d)


@settings(deadline=None, max_examples=40)
@given(scores=st.lists(st.floats(0, 10, allow_nan=False), min_size=1,
                       max_size=25),
       patience=st.integers(1, 5),
       min_delta=st.sampled_from([0.0, 0.1]),
       split_at=st.integers(0, 24))
def test_early_stopping_spec_and_resume(scores, patience, min_delta,
                                        split_at):
    """Independent replay of the reference decision spec (min mode): is_best
    exactly on strict improvement beyond min_delta, early_stop exactly when
    `patience` consecutive non-improvements accumulate — and a state_dict
    round-trip mid-sequence continues identically."""
    es = EarlyStopping(patience=patience, min_delta=min_delta, verbose=False)
    best, counter, stopped = None, 0, False
    for ep, s in enumerate(scores):
        got_best = es(s, epoch=ep)
        # spec replay
        if best is None or s < best - min_delta:
            best, counter, exp_best = s, 0, True
        else:
            counter += 1
            exp_best = False
            if counter >= patience:
                stopped = True
        assert got_best == exp_best
        assert es.early_stop == stopped

    # crash at `split_at`, restore into a fresh instance, continue: the
    # resumed tracker must emit the same decisions as an uninterrupted one
    k = min(split_at, len(scores))
    a = EarlyStopping(patience=patience, min_delta=min_delta, verbose=False)
    for ep, s in enumerate(scores[:k]):
        a(s, epoch=ep)
    b = EarlyStopping(patience=patience, min_delta=min_delta, verbose=False)
    b.load_state_dict(a.state_dict())
    c = EarlyStopping(patience=patience, min_delta=min_delta, verbose=False)
    for ep, s in enumerate(scores):
        expect = c(s, epoch=ep)
        if ep >= k:
            assert b(s, epoch=ep) == expect
    assert b.state_dict() == c.state_dict()


@settings(deadline=None, max_examples=15)
@given(seed=st.integers(0, 2**16), ch=st.sampled_from([2, 4]))
def test_convlstm_gate_bounds(seed, ch):
    """Gate math invariants for any pre-activation/cell-state values:
    h = o*tanh(c') is in (-1, 1) and |c'| <= |c| + 1 (c' = f*c + i*g with
    f,i in (0,1), g in (-1,1))."""
    import jax.numpy as jnp

    from pl_convlstm_gan_tpu.ops.convlstm import convlstm_gates

    rng = np.random.default_rng(seed)
    z = jnp.asarray(rng.normal(0, 5, (1, 3, 3, 4 * ch)).astype(np.float32))
    c = jnp.asarray(rng.normal(0, 5, (1, 3, 3, ch)).astype(np.float32))
    h_new, c_new = convlstm_gates(z, c)
    assert np.all(np.abs(np.asarray(h_new)) <= 1.0)
    assert np.all(np.abs(np.asarray(c_new)) <= np.abs(np.asarray(c)) + 1.0)
