"""Gopher-repetition / lexical-diversity operator tests: exact kernel
vectors, keep-flag semantics, and driver-gate oracle parity at sf0.001."""

import math

import pytest

from deepseek_ocr_rs_ray.pipelines import quality as Q

SF = "/root/testdata/sf0.001"


def test_gopher_repetition_row_exact_vectors():
    # "a b a b a b": 2-grams: (a,b)x3, (b,a)x2 -> top2 = 3*3 = 9
    # 3-grams: (a,b,a)x2, (b,a,b)x2 -> dup3 = 2*5 + 2*5 = 20
    n_chars, top2, dup3 = Q.gopher_repetition_row("a b a b a b")
    assert (n_chars, top2, dup3) == (11, 9, 20)
    # no repeats at all: dup3 = 0; top2 = longest 2-gram (count 1)
    n_chars, top2, dup3 = Q.gopher_repetition_row("xx yyy z")
    assert (top2, dup3) == (len("xx yyy"), 0)
    # under 2 tokens: both zero
    assert Q.gopher_repetition_row("hello")[1:] == (0, 0)
    assert Q.gopher_repetition_row("")[1:] == (0, 0)


def test_gopher_keep_flag_fires_on_repetitive_doc(ray_session, tmp_path):
    import pandas as pd
    import ray.data  # noqa: F401
    d = tmp_path / "sf"
    d.mkdir()
    docs = pd.DataFrame({
        "doc_id": [0, 1],
        "text": ["spam spam spam spam spam spam spam spam",
                 "varied words with no dominant bigram at all here now "
                 "and plenty more distinct filler keeps every single pair "
                 "well under the one fifth character share threshold ok"],
    })
    docs.to_parquet(d / "documents.parquet")
    out = Q.q_gopher_repetition(str(d)).to_pandas().sort_values("doc_id")
    assert out["keep"].tolist() == [0, 1]
    # doc 0: every 2-gram is "spam spam" (7 occurrences x 9 chars = 63 of 39)
    assert out["top2_chars"].iloc[0] == 63
    assert out["top2_frac"].iloc[0] > Q.GOPHER_TOP2_MAX


def test_token_entropy_row_exact():
    # "a a b": counts {a:2, b:1}; H = log2(3) - (2*log2(2))/3
    n, d, s = Q.token_entropy_row("a a b")
    assert (n, d) == (3, 2)
    assert s == pytest.approx(2 * math.log2(2))
    # uniform single token repeated: entropy exactly 0 in the pipeline
    n, d, s = Q.token_entropy_row("x x x x")
    assert (n, d) == (4, 1)
    assert math.log2(n) - s / n == 0.0


@pytest.mark.parametrize("qname", ["q_gopher_repetition", "q_token_entropy"])
def test_quality_sql_oracle_parity_small(ray_session, qname):
    """Driver-gate replication at sf0.001 (dtype-strict compare)."""
    import sys
    sys.path.insert(0, "/root/repo")
    import duckdb

    import __ray_entry__ as m
    from tools.check_correctness import compare, to_pandas
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    ray_df = to_pandas(m.queries()[qname](SF))
    sql_df = con.execute(m.oracle_sql_for(SF)[qname]).fetchdf()
    assert compare(qname, ray_df, sql_df) == []


def test_curation_pipeline_funnel_and_parity(ray_session):
    """The curation funnel is monotone (docs >= gopher-kept >=
    with-embedding >= survivors) and oracle-exact."""
    import sys
    sys.path.insert(0, "/root/repo")
    import duckdb

    import __ray_entry__ as m
    from tools.check_correctness import compare, to_pandas
    ray_df = to_pandas(m.queries()["x_curation_pipeline"](SF))
    r = ray_df.iloc[0]
    assert (r["n_docs"] >= r["n_gopher_kept"] >= r["n_with_embedding"]
            >= r["n_survivors"] > 0)
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    sql_df = con.execute(
        m.oracle_sql_for(SF)["x_curation_pipeline"]).fetchdf()
    assert compare("x_curation_pipeline", ray_df, sql_df) == []


def test_curation_pipeline_join_cutover_parity(ray_session):
    """Forcing broadcast_cap=0 routes the SemDeDup verdict through the
    partitioned Dataset.join path, which must produce the byte-identical
    summary row as the broadcast path."""
    import pandas as pd

    a = Q.x_curation_pipeline(SF).to_pandas()
    b = Q.x_curation_pipeline(SF, broadcast_cap=0).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_gopher_empty_text_cross_engine(ray_session, tmp_path):
    """Empty / whitespace-only docs: fractions exactly 0.0 and keep=1 on
    BOTH engines (DuckDB 0/0 would be NULL without the CASE guard)."""
    import duckdb
    import pandas as pd

    from deepseek_ocr_rs_ray.pipelines.quality import Q_GOPHER_SQL
    d = tmp_path / "sf"
    d.mkdir()
    pd.DataFrame({"doc_id": [0, 1, 2],
                  "text": ["", "   \t  ", "normal words here"]}).to_parquet(
        d / "documents.parquet")
    ray_df = (Q.q_gopher_repetition(str(d)).to_pandas()
              .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    sql_df = (con.execute(Q_GOPHER_SQL).fetchdf()
              .sort_values("doc_id").reset_index(drop=True))
    assert ray_df["top2_frac"].tolist() == sql_df["top2_frac"].tolist()
    assert ray_df["keep"].tolist() == sql_df["keep"].tolist()
    # the empty/whitespace docs keep=1 with fractions exactly 0.0 (the
    # third, a short doc whose longest bigram tops 20% of chars, drops)
    assert ray_df["keep"].tolist()[:2] == [1, 1]
    assert ray_df["top2_frac"].tolist()[:2] == [0.0, 0.0]
    assert str(sql_df["keep"].dtype) == "int64"   # no NULL→float64 poison
