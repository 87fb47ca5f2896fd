"""Host-sharding verification helper.

Proves the per-host slicing contract of :mod:`.pipeline` on ONE host (H
simulated processes each decode only their contiguous slice of the global
batch, and the concatenation equals the single-process batch bit-for-bit).
Verification-only code, kept out of the production loader module; run by
``__graft_entry__.dryrun_multichip`` (the driver's multi-chip gate) and the
test suite."""

from __future__ import annotations

import numpy as np

from .pipeline import DataLoader, SyntheticSource

def hostshard_selftest() -> None:

    class Recording:
        """Records each load_batch call (the prefetch thread keeps loading
        subsequent batches, so only the FIRST call is the first batch)."""

        def __init__(self, inner):
            self.inner = inner
            self.calls = []

        def __len__(self):
            return len(self.inner)

        def load_batch(self, indices):
            self.calls.append(np.asarray(indices).tolist())
            return self.inner.load_batch(indices)

    H, B = 2, 8
    base = SyntheticSource(size=32, img_size=8, seed=7)
    full_x, _ = next(iter(DataLoader(
        base, B, shuffle=True, seed=13, process_index=0, process_count=1)))
    parts, first = [], []
    for h in range(H):
        rec = Recording(SyntheticSource(size=32, img_size=8, seed=7))
        x, _ = next(iter(DataLoader(
            rec, B, shuffle=True, seed=13,
            process_index=h, process_count=H)))
        assert x.shape[0] == B // H, x.shape
        parts.append(np.asarray(x))
        first.append(rec.calls[0])
    assert not set(first[0]) & set(first[1]), "hosts decoded overlapping rows"
    assert len(first[0]) == len(first[1]) == B // H
    np.testing.assert_array_equal(np.concatenate(parts), np.asarray(full_x))
