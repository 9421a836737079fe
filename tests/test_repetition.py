"""Repetition signals (Gopher-style filters): the pipeline must equal a
DuckDB SQL oracle EXACTLY — duplicate line/paragraph fractions via
string_split + grouped counts, top n-gram char fractions via
list_transform n-gram generation. All ratios are single int/int
divisions, so equality is bit-exact."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"

PLANTED = [
    "repeat line\nrepeat line\nunique line\nrepeat line",
    "para one\n\npara one\n\npara two",
    "spam spam spam spam spam and more spam spam spam",
    "a b c d a b c d a b c d",  # heavy 2/3/4-gram repetition
    "",
    "   \n\t\n  ",  # whitespace only
    "word",
    "x\ny\nz",  # all unique
    "Tab\t line \nTab\t line ",  # strip semantics
    "one two\n\n\none two",  # \n\n\n -> middle para is "\n" -> stripped empty
]


def _docs_df():
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).df()
    planted = pd.DataFrame({
        "doc_id": [200000 + i for i in range(len(PLANTED))],
        "text": PLANTED,
    })
    return pd.concat([docs, planted], ignore_index=True)


_STRIP_LINE = "' ' || chr(9) || chr(13)"
_STRIP_PARA = "' ' || chr(9) || chr(13) || chr(10)"


def _dup_sql(con, split: str, strip_chars: str) -> pd.DataFrame:
    return con.execute(f"""
        WITH items AS (
          SELECT doc_id, unnest(
            [y for y in [trim(x, {strip_chars})
                         for x in string_split(coalesce(text, ''), {split})]
             if y <> '']) AS v
          FROM docs
        ), per AS (
          SELECT doc_id, v, count(*) AS c, length(v) AS L
          FROM items GROUP BY doc_id, v
        )
        SELECT doc_id,
               sum(c)::bigint AS n,
               (sum(c) - count(*))::double / sum(c) AS dup_frac,
               sum(CASE WHEN c > 1 THEN (c - 1) * L ELSE 0 END)::double
                 / sum(c * L) AS dup_char_frac
        FROM per GROUP BY doc_id
    """).df()


def _topgram_sql(con, n: int) -> pd.DataFrame:
    concat = " || ' ' || ".join(f"ws[i+{j}]" for j in range(n))
    return con.execute(f"""
        WITH words AS (
          SELECT doc_id,
                 regexp_extract_all(lower(coalesce(text, '')),
                                    '[a-z0-9]+') AS ws
          FROM docs
        ), grams AS (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(ws) - {n - 2}),
                                       i -> {concat})) AS g,
                 length(array_to_string(ws, ' ')) AS dn
          FROM words
        ), counted AS (
          SELECT doc_id, g, dn, count(*) AS cnt
          FROM grams GROUP BY doc_id, g, dn
        )
        SELECT doc_id, max(cnt * length(g))::double / any_value(dn) AS frac
        FROM counted GROUP BY doc_id
    """).df()


@pytest.mark.usefixtures("ray_session")
def test_repetition_signals_match_duckdb():
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.textstats import (
        repetition_stage,
    )

    df = _docs_df()
    got = (repetition_stage(rd.from_pandas(df)).to_pandas()
           .sort_values("doc_id", ignore_index=True).set_index("doc_id"))

    con = duckdb.connect()
    con.register("docs", df)

    want_lines = _dup_sql(con, "chr(10)", _STRIP_LINE).set_index("doc_id")
    want_paras = _dup_sql(con, "chr(10) || chr(10)",
                          _STRIP_PARA).set_index("doc_id")

    for doc_id in df["doc_id"]:
        g = got.loc[doc_id]
        for want, pre in ((want_lines, "line"), (want_paras, "para")):
            if doc_id in want.index:
                w = want.loc[doc_id]
                assert g[f"n_{pre}s"] == w["n"], (doc_id, pre)
                assert g[f"dup_{pre}_frac"] == w["dup_frac"], (doc_id, pre)
                assert g[f"dup_{pre}_char_frac"] == w["dup_char_frac"], \
                    (doc_id, pre)
            else:  # no non-empty items -> zeros
                assert g[f"n_{pre}s"] == 0 and g[f"dup_{pre}_frac"] == 0.0

    for n in (2, 3, 4):
        want_g = _topgram_sql(con, n).set_index("doc_id")
        col = f"top_{n}gram_char_frac"
        for doc_id in df["doc_id"]:
            if doc_id in want_g.index:
                assert got.loc[doc_id, col] == want_g.loc[doc_id, "frac"], \
                    (doc_id, n)
            else:
                assert got.loc[doc_id, col] == 0.0, (doc_id, n)

    # the planted docs exercise every signal's non-trivial range
    assert got.loc[200000, "dup_line_frac"] == 0.5  # 4 lines, 2 distinct
    assert got.loc[200001, "dup_para_frac"] == pytest.approx(1 / 3)
    assert got.loc[200003, "top_4gram_char_frac"] > 0.5
    assert got.loc[200004, "n_lines"] == 0
    assert got.loc[200007, "dup_line_frac"] == 0.0
