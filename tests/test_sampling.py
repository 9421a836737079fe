"""Deterministic sampling: membership must equal the DuckDB md5 oracle
exactly (same rows, not statistically similar rows)."""

from __future__ import annotations

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
DOCS = f"{SF_DIR}/documents.parquet"


@pytest.mark.usefixtures("ray_session")
def test_sample_fraction_matches_duckdb():
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.sampling import (
        fraction_threshold_hex, sample_fraction,
    )

    ds = rd.read_parquet(DOCS, columns=["doc_id", "lang"])
    got = (sample_fraction(ds, 0.25, "doc_id", seed=7)
           .to_pandas().sort_values("doc_id", ignore_index=True))

    thresh = fraction_threshold_hex(0.25)
    want = duckdb.sql(f"""
        SELECT doc_id, lang FROM read_parquet('{DOCS}')
        WHERE md5(concat('7|', CAST(doc_id AS VARCHAR))) < '{thresh}'
        ORDER BY doc_id
    """).df()
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert list(got["lang"]) == list(want["lang"])
    n_total = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{DOCS}')").fetchone()[0]
    # non-vacuous and roughly at rate
    assert 0 < len(got) < n_total
    assert abs(len(got) / n_total - 0.25) < 0.1


@pytest.mark.usefixtures("ray_session")
def test_sample_fraction_edges():
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.sampling import (
        sample_fraction,
    )

    ds = rd.read_parquet(DOCS, columns=["doc_id"])
    n = ds.count()
    assert sample_fraction(ds, 1.0, "doc_id").count() == n
    assert sample_fraction(ds, 0.0, "doc_id").count() == 0
    with pytest.raises(ValueError):
        sample_fraction(ds, 1.5, "doc_id")


@pytest.mark.usefixtures("ray_session")
def test_sample_fraction_seeds_decorrelate():
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.sampling import (
        sample_fraction,
    )

    ds = rd.read_parquet(DOCS, columns=["doc_id"])
    a = set(sample_fraction(ds, 0.3, "doc_id", seed=1)
            .to_pandas()["doc_id"])
    b = set(sample_fraction(ds, 0.3, "doc_id", seed=2)
            .to_pandas()["doc_id"])
    assert a != b
    assert a and b


@pytest.mark.usefixtures("ray_session")
class TestStratified:
    def test_matches_duckdb(self):
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.sampling import (
            stratified_sample,
        )

        ds = rd.read_parquet(DOCS, columns=["doc_id", "lang", "n_chars"])
        got = (stratified_sample(ds, "lang", 7, "doc_id", seed=3)
               .to_pandas().sort_values("doc_id", ignore_index=True))

        want = duckdb.sql(f"""
            SELECT doc_id, lang, n_chars FROM read_parquet('{DOCS}')
            QUALIFY row_number() OVER (
              PARTITION BY lang
              ORDER BY md5(concat('3|', CAST(doc_id AS VARCHAR))), doc_id
            ) <= 7
            ORDER BY doc_id
        """).df()
        assert list(got["doc_id"]) == list(want["doc_id"])
        assert list(got["lang"]) == list(want["lang"])
        assert list(got["n_chars"]) == list(want["n_chars"])
        # every group hit its quota (sf0.001 langs all have >= 7 docs)
        per = got.groupby("lang").size()
        assert (per == 7).all()

    def test_partition_invariance(self):
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.sampling import (
            stratified_sample,
        )

        ds = rd.read_parquet(DOCS, columns=["doc_id", "lang"])
        a = (stratified_sample(ds.repartition(1), "lang", 5, "doc_id")
             .to_pandas().sort_values("doc_id", ignore_index=True))
        b = (stratified_sample(ds.repartition(17), "lang", 5, "doc_id")
             .to_pandas().sort_values("doc_id", ignore_index=True))
        assert list(a["doc_id"]) == list(b["doc_id"])

    def test_null_group_forms_its_own_partition(self):
        import pyarrow as pa
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.sampling import (
            stratified_sample,
        )

        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(list(range(20)), pa.int64()),
            "lang": pa.array((["en"] * 8 + [None] * 8 + ["de"] * 4),
                             pa.string())}))
        got = (stratified_sample(ds, "lang", 3, "doc_id", seed=1)
               .to_pandas())
        sizes = got.groupby("lang", dropna=False).size()
        assert sizes.get("en") == 3
        assert sizes.get("de") == 3
        # NULL-lang rows are a partition of their own, like DuckDB's
        # PARTITION BY — never silently dropped
        assert int(sizes[sizes.index.isna()].iloc[0]) == 3

    def test_quota_exceeds_group(self):
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.sampling import (
            stratified_sample,
        )

        ds = rd.read_parquet(DOCS, columns=["doc_id", "lang"])
        n = ds.count()
        got = stratified_sample(ds, "lang", 10**9, "doc_id")
        assert got.count() == n


@pytest.mark.usefixtures("ray_session")
class TestWeightedSample:
    """weighted_sample: exact DuckDB oracle (ORDER BY ln(u)/w DESC),
    statistical sanity, determinism across layouts."""

    def _docs_with_weights(self):
        import ray.data as rd

        ds = rd.read_parquet(DOCS, columns=["doc_id", "n_chars"])

        def to_w(df):
            df = df.copy()
            df["w"] = df["n_chars"].astype("float64") + 1.0
            return df[["doc_id", "w"]]

        return ds.map_batches(to_w, batch_format="pandas")

    def test_matches_duckdb(self):
        from temporal_knowledge_graphs_ray.stages.sampling import (
            weighted_sample, weighted_sample_uniform_sql,
        )

        got = (weighted_sample(self._docs_with_weights(), 40, "w",
                               "doc_id", seed=3)
               .to_pandas().sort_values("doc_id", ignore_index=True))
        u = weighted_sample_uniform_sql(
            "CAST(doc_id AS VARCHAR)", 3)
        want = duckdb.sql(f"""
            SELECT doc_id, w FROM (
              SELECT doc_id, CAST(n_chars AS DOUBLE) + 1.0 AS w
              FROM read_parquet('{DOCS}'))
            ORDER BY ln({u}) / w DESC, doc_id LIMIT 40
        """).df().sort_values("doc_id", ignore_index=True)
        assert list(got["doc_id"]) == list(want["doc_id"])

    def test_prefers_heavy_rows(self):
        import pandas as pd
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.sampling import (
            weighted_sample,
        )

        # 50 heavy rows (w=1000) among 1000 light rows (w=1): a
        # uniform draw of 100 keeps ~5 heavy; weighted keeps most
        df = pd.DataFrame({
            "k": [f"r{i}" for i in range(1050)],
            "w": [1000.0] * 50 + [1.0] * 1000,
        })
        got = weighted_sample(rd.from_pandas(df), 100, "w", "k",
                              seed=11).to_pandas()
        n_heavy = (got["w"] == 1000.0).sum()
        assert n_heavy >= 40
        assert len(got) == 100

    def test_layout_invariance_and_determinism(self):
        from temporal_knowledge_graphs_ray.stages.sampling import (
            weighted_sample,
        )

        ds = self._docs_with_weights()
        a = (weighted_sample(ds.repartition(1), 25, "w", "doc_id",
                             seed=5).to_pandas()
             .sort_values("doc_id", ignore_index=True))
        b = (weighted_sample(ds.repartition(13), 25, "w", "doc_id",
                             seed=5).to_pandas()
             .sort_values("doc_id", ignore_index=True))
        assert list(a["doc_id"]) == list(b["doc_id"])

    def test_bad_weights_rejected(self):
        import pandas as pd
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.sampling import (
            weighted_sample,
        )

        df = pd.DataFrame({"k": ["a", "b"], "w": [1.0, 0.0]})
        with pytest.raises(Exception):
            weighted_sample(rd.from_pandas(df), 1, "w", "k").count()

    def test_k_exceeds_rows(self):
        import pandas as pd
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.sampling import (
            weighted_sample,
        )

        df = pd.DataFrame({"k": ["a", "b", "c"], "w": [1.0, 2.0, 3.0]})
        got = weighted_sample(rd.from_pandas(df), 10, "w", "k")
        assert got.count() == 3
