"""Context-window chunking vs a pure-Python oracle + plan shape."""

import pytest

import bench
from chronon_spark.operators.chunking import chunk_documents, chunk_stats

CHUNK, OVERLAP = 8, 3
STRIDE = CHUNK - OVERLAP


def _py_chunks(text: str):
    toks = text.strip().split()
    if not toks:
        return []
    out, start = [], 0
    while True:
        win = toks[start : start + CHUNK]
        out.append((len(win), " ".join(win)))
        if start + CHUNK >= len(toks):
            return out
        start += STRIDE


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, " ".join(f"t{i}" for i in range(3))),        # < chunk
        (1, " ".join(f"t{i}" for i in range(CHUNK))),    # == chunk
        (2, " ".join(f"t{i}" for i in range(CHUNK + 1))),
        (3, " ".join(f"t{i}" for i in range(40))),       # many strides
        (4, "   "),                                       # blank -> no chunks
        (5, "one"),
        (6, " ".join(f"t{i}" for i in range(CHUNK + STRIDE))),  # exact stride end
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_chunks_match_python_oracle(spark, docs):
    got = (
        chunk_documents(docs, "doc_id", chunk_tokens=CHUNK, overlap=OVERLAP)
        .orderBy("doc_id", "chunk_index")
        .collect()
    )
    exp = []
    for r in docs.orderBy("doc_id").collect():
        for i, (n, txt) in enumerate(_py_chunks(r.text)):
            exp.append((r.doc_id, i, n, txt))
    assert [(r.doc_id, r.chunk_index, r.n_tokens, r.chunk_text) for r in got] == exp
    assert not any(r[0] == 4 for r in exp)  # blank doc dropped


def test_overlap_and_coverage_invariants(spark, docs):
    chunks = chunk_documents(docs, "doc_id", chunk_tokens=CHUNK, overlap=OVERLAP)
    rows = chunks.orderBy("doc_id", "chunk_index").collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.chunk_text.split())
    originals = {r.doc_id: r.text.strip().split() for r in docs.collect()}
    for doc_id, cs in by_doc.items():
        orig = originals[doc_id]
        # every full chunk shares exactly OVERLAP tokens with its successor
        for a, b in zip(cs, cs[1:]):
            assert a[STRIDE:] == b[: len(a) - STRIDE]
            assert len(b) > OVERLAP  # tails are never overlap-only
        # de-overlapped concatenation reconstructs the token stream exactly
        rebuilt = list(cs[0]) + [t for c in cs[1:] for t in c[OVERLAP:]]
        assert rebuilt == orig


def test_chunk_stats(spark, docs):
    chunks = chunk_documents(docs, "doc_id", chunk_tokens=CHUNK, overlap=OVERLAP)
    stats = {r.doc_id: r for r in chunk_stats(chunks, "doc_id").collect()}
    assert stats[3].n_chunks == len(_py_chunks(" ".join(f"t{i}" for i in range(40))))
    assert stats[3].max_chunk_tokens <= CHUNK
    assert stats[0].n_chunks == 1 and stats[0].total_tokens == 3


def test_chunking_plan_is_narrow(spark, docs):
    d = bench.plan_digest(chunk_documents(docs, "doc_id"))
    assert d["exchanges"] == 0
    assert d["python_stages"] == 0


def test_chunking_random_property(spark):
    """Hypothesis: random token counts x random (chunk, overlap) params
    equal the pure-Python oracle; single Spark job per example batch."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    from chronon_spark.operators.chunking import chunk_documents

    @st.composite
    def params(draw):
        chunk = draw(st.integers(2, 12))
        overlap = draw(st.integers(0, chunk - 1))
        lens = draw(st.lists(st.integers(0, 40), min_size=1, max_size=8))
        return chunk, overlap, lens

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(p=params())
    def run(p):
        chunk, overlap, lens = p
        stride = chunk - overlap
        rows = [(i, " ".join(f"w{i}x{j}" for j in range(n))) for i, n in enumerate(lens)]
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        got = [
            (r.doc_id, r.chunk_index, r.n_tokens, r.chunk_text)
            for r in chunk_documents(
                docs, "doc_id", chunk_tokens=chunk, overlap=overlap
            ).orderBy("doc_id", "chunk_index").collect()
        ]
        exp = []
        for i, n in enumerate(lens):
            toks = [f"w{i}x{j}" for j in range(n)]
            if not toks:
                continue
            start, idx = 0, 0
            while True:
                win = toks[start : start + chunk]
                exp.append((i, idx, len(win), " ".join(win)))
                if start + chunk >= len(toks):
                    break
                start += stride
                idx += 1
        assert got == exp

    run()
