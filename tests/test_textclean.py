"""clean_text contract — verbatim port of the reference's golden test
(/root/reference/tests/test_ocr.py:127-140) plus the SQL-form parity check."""

from ankiocr_spark.textclean import clean_text, CLEAN_TEXT_SQL_TEMPLATE


def test_clean_text_reference_golden():
    # input/expected pair copied from tests/test_ocr.py:128-139 exactly
    input_str = (
        "this is some text: with a result\n\n\nThis is some double colon :: with result"
        "\n\nwithout spaces::new word\none space:: new word\n\n\n\none space before ::new word\n"
        "triple ::: new word\n\n\n\n\nquadruple ::::newword"
        ""
    )
    expected_output = (
        "this is some text: with a result\nThis is some double colon : with result\n"
        "without spaces:new word\none space: new word\none space before :new word\n"
        "triple : new word\nquadruple :newword"
    )
    assert clean_text(input_str) == expected_output


def test_clean_text_edges():
    assert clean_text("") == ""
    assert clean_text("\n\n\n") == ""
    assert clean_text("  a  ") == "a"
    assert clean_text(":::") == ":"


def test_sql_form_matches(spark):
    """The Spark-SQL expression form used by oracle queries must agree with
    the Python function on newline/colon-shaped inputs."""
    samples = [
        "this is some text: with a result\n\n\ndouble :: colon",
        "a\n  b  \n\nc::d\n:::\n",
        "plain single line",
        "",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "t string")
    expr = CLEAN_TEXT_SQL_TEMPLATE.format(col="t")
    got = [r[0] for r in df.selectExpr(f"{expr} as c").collect()]
    assert got == [clean_text(s) for s in samples]
