from wiser_spark.operators.highlight import highlight


def test_highlight_topk(spark):
    docs = spark.createDataFrame(
        [
            (0, "import os\nreturn the value. nothing here.\nimport sys again"),
            (1, "no match at all in this doc"),
            (2, "return return return"),
        ],
        "doc_id long, content string",
    )
    topk = spark.createDataFrame([(0,), (2,)], "doc_id long")
    got = {r["doc_id"]: r["snippet"] for r in
           highlight(docs, topk, ["return", "import"], n_passages=2).collect()}
    assert set(got) == {0, 2}  # only result docs get snippets
    assert "<b>import</b> os" in got[0]
    assert "…" in got[0]  # two passages joined
    assert got[2] == "<b>return</b> <b>return</b> <b>return</b>"
    # no partial-word bolding
    assert "<b>returnx" not in got[0]
