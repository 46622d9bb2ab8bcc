"""Null/edge-document differential: every documents-consuming catalog query
must agree with its DuckDB oracle on a corpus containing NULL text / lang /
source / n_chars, empty and whitespace-only texts, multi-byte scripts, and
embedded tabs/newlines — the rows real corpora contain and the driver
fixtures don't. This audit found (r8): an ANSI 1/0 crash in the quality
score, md5('') fingerprints for NULL texts, NULLS FIRST/LAST rank shifts in
winsorize and percent-rank, XML whitespace trimming, engine-vs-oracle row
contracts on unnest-dropped NULL texts, and undeclared domains on the
payload-synthesis queries."""

import glob
import inspect
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datapipelines_spark.catalog import all_queries
from datapipelines_spark.testing import compare_query

_EDGE_DOCS = [
    {"doc_id": 9001, "text": None, "lang": "en", "source": "edge", "n_chars": None},
    {"doc_id": 9002, "text": "", "lang": "en", "source": "edge", "n_chars": 0},
    {"doc_id": 9003, "text": "   ", "lang": None, "source": "edge", "n_chars": 3},
    {"doc_id": 9004, "text": "one", "lang": "en", "source": None, "n_chars": 3},
    {"doc_id": 9005, "text": "a b", "lang": "xx", "source": "edge", "n_chars": 3},
    {"doc_id": 9006, "text": "漢字 文本 テキスト déjà vu encore", "lang": "ja",
     "source": "edge", "n_chars": 22},
    {"doc_id": 9007, "text": None, "lang": None, "source": None, "n_chars": None},
    {"doc_id": 9008, "text": "repeat " * 7 + "repeat", "lang": "en",
     "source": "edge", "n_chars": 55},
    {"doc_id": 9009, "text": "tab\tand\nnewline mixed  double  spaces",
     "lang": "en", "source": "edge", "n_chars": 37},
]

_DOC_QUERIES = sorted(
    n for n, s in all_queries().items()
    if "documents" in inspect.getsource(s.builder)
)


@pytest.fixture(scope="session")
def null_edge_dir(sf_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("sf_null_edge")
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)
        if name != "documents.parquet":
            shutil.copy(p, out / name)
    t = pq.read_table(f"{sf_dir}/documents.parquet")
    merged = pa.Table.from_pylist(
        t.to_pylist() + _EDGE_DOCS, schema=t.schema.remove_metadata()
    )
    pq.write_table(merged, out / "documents.parquet")
    return str(out)


@pytest.mark.parametrize("name", _DOC_QUERIES)
def test_query_matches_oracle_on_null_edge_corpus(spark, null_edge_dir, name):
    ok, detail = compare_query(spark, null_edge_dir, name)
    assert ok, f"{name}: {detail}"
