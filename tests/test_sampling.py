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
