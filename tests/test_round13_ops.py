"""Round-4 additions: distributed-vs-local twins for the graph local
fast paths touched this round, exercised by forcing the size gate."""

from __future__ import annotations

import pandas as pd
import pytest

from pdf_extractor_ray.pipelines.queries import graphs as G

SF = "/root/testdata/sf0.001"


def _canon(t):
    df = t.to_pandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
def test_clustering_coeff_local_equals_distributed(monkeypatch):
    """The round-4 local merge (numpy degrees + deg/nt join, zero
    exchanges) must equal the distributed node-bucketed path on the
    same lake — gate forced to 0 to drive the distributed regime."""
    local = _canon(G.q_clustering_coeff(SF))
    monkeypatch.setattr(G, "_TRI_LOCAL_MAX_BYTES", 0)
    dist = _canon(G.q_clustering_coeff(SF))
    pd.testing.assert_frame_equal(local, dist)
    assert len(local) > 0
