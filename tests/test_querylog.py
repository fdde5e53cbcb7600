from wiser_spark.sources.querylog import load_query_log, parse_query_line


def test_parse_plain_and_phrase():
    assert parse_query_line("hello world\n") == (["hello", "world"], False)
    assert parse_query_line('"hello world"') == (["hello", "world"], True)
    assert parse_query_line('"single"') == (["single"], True)
    # tokenizer alphabet applies: punctuation splits, case folds
    assert parse_query_line("Foo-Bar_baz") == (["foo", "bar_baz"], False)


def test_load_query_log(tmp_path):
    p = tmp_path / "q.log"
    p.write_text('return import\n"def main"\n\nmalloc\n')
    qs = load_query_log(str(p))
    assert [(list(q.terms), q.is_phrase) for q in qs] == [
        (["return", "import"], False),
        (["def", "main"], True),
        (["malloc"], False),
    ]
    assert [q.query_id for q in qs] == [0, 1, 3]
