"""Background frame prefetcher (datasets/prefetch.py)."""
import time

import numpy as np

from isogs_slam_tpu.datasets.prefetch import Prefetcher
import pytest

pytestmark = pytest.mark.smoke  # sub-5-min CI subset


class SlowDataset:
    def __init__(self, n=20, delay=0.02):
        self.n = n
        self.delay = delay
        self.loads = []

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        self.loads.append(i)
        time.sleep(self.delay)
        return np.full((4,), i, np.float32)


def test_prefetcher_values_and_overlap():
    ds = SlowDataset()
    pf = Prefetcher(ds, depth=3)
    try:
        # sequential access returns correct values
        for i in range(20):
            v = pf[i]
            assert v[0] == i
            time.sleep(0.025)  # "device work" while lookahead decodes
        # lookahead actually ran ahead (every index loaded; a consumer
        # miss may race the worker into one duplicate load, never more)
        assert sorted(set(ds.loads)) == list(range(20))
        assert len(ds.loads) <= 20 + 2
        # random access still correct
        assert pf[3][0] == 3
    finally:
        pf.close()


def test_prefetcher_proxies_attributes():
    ds = SlowDataset()
    ds.png_depth_scale = 6553.5
    pf = Prefetcher(ds, depth=2)
    try:
        assert pf.png_depth_scale == 6553.5
        assert len(pf) == 20
    finally:
        pf.close()
