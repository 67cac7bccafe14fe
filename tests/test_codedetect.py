"""Code-vs-prose detection (X233): real code snippets vs prose, per-signal
mirror arithmetic, empty/NULL handling, single-signal non-triggers."""

PY_CODE = (
    "def parse_config(path):\n"
    "    with open(path) as f:\n"
    "        data = json.load(f)\n"
    "    return {k: v for k, v in data.items() if v is not None}\n"
    "\n"
    "class Loader:\n"
    "    def __init__(self, root):\n"
    "        self.root = root\n"
)
JS_CODE = (
    "const fetchUser = async (userId) => {\n"
    "  const res = await fetch(`/api/${userId}`);\n"
    "  if (!res.ok) { throw new Error('nope'); }\n"
    "  return res.json();\n"
    "};\n"
    "let retryCount = 0;\n"
)
PROSE = (
    "The committee met on Thursday to review the annual budget. After a "
    "long discussion about infrastructure spending, the members voted to "
    "defer the decision until the next quarterly session. Several residents "
    "spoke in favor of the proposed park renovation."
)
MATHY_PROSE = (
    "The equation (a + b) = c holds for all values; however, the bound "
    "x < y fails when z > 0. See section (ii) for details."
)


def test_code_vs_prose(spark):
    from corpusama_spark.operators.textstats import code_prose_stats

    df = spark.createDataFrame(
        [(1, PY_CODE), (2, JS_CODE), (3, PROSE), (4, MATHY_PROSE),
         (5, ""), (6, None)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in code_prose_stats(df).collect()}
    assert out[1].is_code and out[1].code_points >= 3
    assert out[2].is_code
    assert not out[3].is_code and out[3].code_points == 0
    # symbol-bearing prose may trip ONE signal but not the vote
    assert not out[4].is_code
    # empty / NULL -> all-zero, prose, no NULLs anywhere
    for i in (5, 6):
        r = out[i]
        assert r.code_points == 0 and not r.is_code
        assert r.indent_share == 0.0 and r.symbol_density == 0.0


def test_signal_arithmetic_mirror(spark):
    from corpusama_spark.operators.textstats import code_prose_stats

    df = spark.createDataFrame([(1, PY_CODE)], "doc_id long, text string")
    r = code_prose_stats(df).collect()[0]
    lines = [l for l in PY_CODE.split("\n") if l.strip()]
    toks = PY_CODE.split()
    assert r.n_lines == len(lines) and r.n_tokens == len(toks)
    indented = sum(1 for l in lines if l.startswith(("  ", "\t")))
    assert r.indent_share == round(indented / len(lines), 6)
    import re

    sym = len(re.findall(r"[{}()\[\];=<>]", PY_CODE))
    assert r.symbol_density == round(sym / len(PY_CODE), 6)
    # mirror only the operator's keyword list (English-collision words
    # like with/as/for/if are deliberately absent from it)
    listed = {"def", "class", "import", "return", "self", "None"}
    hits = sum(1 for t in toks if t in listed)
    assert r.kw_rate == round(hits / len(toks), 6)
