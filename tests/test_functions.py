import math

from pyspark.sql import functions as F

from dxf_postgis_converter_spark.functions.naming import (
    helmert_apply, helmert_fit, normalize_handle, short_id, table_name,
    transliterate, transliterate_py, unescape_dxf_unicode_py,
)
from dxf_postgis_converter_spark.functions.text import (
    fingerprint, lang_id, quality_score, token_count, word_token_count,
)


def test_transliterate(spark):
    df = spark.createDataFrame([("Фундамент",), ("Отметки фундамента",), ("walls_ext",)], "s string")
    got = [r[0] for r in df.select(transliterate(F.col("s"))).collect()]
    assert got == ["Fundament", "Otmetki fundamenta", "walls_ext"]
    assert transliterate_py("Щука и ёж") == "Shchuka i ezh"


def test_transliterate_latin_accents(spark):
    """F1 beyond Cyrillic: unidecode-compatible accent strip for the
    Latin-1/Extended-A domain, JVM translate+replace == python mirror."""
    import pyspark.sql.functions as F

    from dxf_postgis_converter_spark.functions.naming import (
        transliterate, transliterate_py,
    )
    cases = {
        "Çelik Köşk": "Celik Kosk",
        "Grünstraße": "Grunstrasse",
        "Åse Ærø": "Ase AEro",
        "Łódź żółw": "Lodz zolw",
        "Přílißné œuvre": "Prilissne oeuvre",
        "Стена-ß-Ü": "Stena-ss-U",
        "Дверь Подъезд": "Dver Podezd",
    }
    for s, want in cases.items():
        assert transliterate_py(s) == want, s
    df = spark.createDataFrame([(s,) for s in cases], "s string")
    got = {r[0]: r[1] for r in df.select("s", transliterate(F.col("s"))).collect()}
    assert got == cases


def test_table_name_template(spark):
    df = spark.createDataFrame(
        [("123e4567-e89b-12d3-a456-426614174000", "Отметки фундамента")],
        "doc_id string, layer string")
    row = df.select(
        short_id(F.col("doc_id")).alias("sid"),
        table_name(F.col("doc_id"), F.col("layer")).alias("tn"),
        table_name(F.col("doc_id"), F.col("layer"), use_prefix=False).alias("tn2"),
    ).first()
    assert row.sid == "123e45"
    assert row.tn == "l123e45_otmetki_fundamenta"
    assert row.tn2 == "otmetki_fundamenta"


def test_handle_normalization(spark):
    df = spark.createDataFrame([("  AbC1 ",)], "h string")
    assert df.select(normalize_handle(F.col("h"))).first()[0] == "abc1"
    assert df.select(normalize_handle(F.col("h"), lower=False)).first()[0] == "ABC1"


def test_unescape_dxf_unicode():
    assert unescape_dxf_unicode_py(r"a\U+0414b") == "aДb"


def test_helmert_identity_and_scale():
    # identity
    p = helmert_fit((0, 0), (0, 0), (1, 0), (1, 0))
    assert p == (1.0, 0.0, 0.0, 0.0)
    # scale 2 + translate (5, 7)
    p = helmert_fit((0, 0), (5, 7), (1, 0), (7, 7))
    a, b, tx, ty = p
    assert (a, b, tx, ty) == (2.0, 0.0, 5.0, 7.0)
    # rotation 90°: (1,0)->(0,1)
    a, b, tx, ty = helmert_fit((0, 0), (0, 0), (1, 0), (0, 1))
    assert math.isclose(a, 0) and math.isclose(b, 1)


def test_helmert_apply_columns(spark):
    df = spark.createDataFrame([(3.0, 4.0)], "x double, y double")
    xc, yc = helmert_apply(F.col("x"), F.col("y"), (2.0, 0.0, 5.0, 7.0))
    row = df.select(xc.alias("x2"), yc.alias("y2")).first()
    assert (row.x2, row.y2) == (11.0, 15.0)


def test_text_functions(spark):
    df = spark.createDataFrame(
        [("hello world the cat", ), ("отметка фундамента на оси", ), ("", ), ("!!! ... ???",)],
        "text string")
    rows = df.select(
        token_count(F.col("text")).alias("tc"),
        word_token_count(F.col("text")).alias("wc"),
        lang_id(F.col("text")).alias("lang"),
        quality_score(F.col("text")).alias("q"),
        fingerprint(F.col("text")).alias("fp"),
    ).collect()
    assert [r.tc for r in rows] == [4, 4, 0, 3]
    assert rows[0].lang == "en" and rows[1].lang == "ru" and rows[2].lang == "und" and rows[3].lang == "und"
    assert rows[0].q > rows[3].q  # punctuation garbage scores lower
    assert rows[0].fp != rows[1].fp and len(rows[0].fp) == 32
    # fingerprint is whitespace/case-insensitive
    df2 = spark.createDataFrame([("Hello   WORLD the cat",)], "text string")
    assert df2.select(fingerprint(F.col("text"))).first()[0] == rows[0].fp


def test_dxf_unicode_unescape(spark):
    from dxf_postgis_converter_spark.functions.text import dxf_unicode_unescape
    import pyspark.sql.functions as F
    df = spark.createDataFrame(
        [("\\U+0424 dom \\U+2116 5",), ("plain",), ("bad \\U+ZZZZ",), ("",)], "t string")
    got = [r.u for r in df.select(dxf_unicode_unescape(F.col("t")).alias("u")).collect()]
    assert got == ["Ф dom № 5", "plain", "bad \\U+ZZZZ", ""]


def test_winnowing_fingerprints(spark):
    from dxf_postgis_converter_spark.functions.text import (
        shared_fingerprint_pairs, winnowing_fingerprints,
    )
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank"),
        (2, "the quick brown fox jumps over the lazy dog near the river bend"),  # near-dup of 1
        (3, "completely different content about spark partitions and shuffles"),
        (4, ""),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {r.doc_id: r.fingerprints for r in winnowing_fingerprints(d).collect()}
    assert all(len(v) > 0 for v in fps.values())           # total function
    assert fps[1] != fps[3]
    # determinism
    fps2 = {r.doc_id: r.fingerprints for r in winnowing_fingerprints(d).collect()}
    assert fps == fps2
    # near-dup pair shares far more fingerprints than unrelated pair
    shared = {(r.id_a, r.id_b): r.n_shared
              for r in shared_fingerprint_pairs(d, min_shared=1).collect()}
    assert shared.get((1, 2), 0) > shared.get((1, 3), 0)
    assert shared[(1, 2)] >= 3


def test_pii_redaction(spark):
    from dxf_postgis_converter_spark.functions.text import has_pii, redact_pii

    rows = [
        (1, "mail me at jane.doe+x@sub.example.org please"),
        (2, "call +1 555 12345678 now"),
        (3, "server at 192.168.0.1 responded"),
        (4, "clean text, version 1.2 unharmed, a@b insufficient"),
        (5, "two hits: a@b.co and 10.0.0.255"),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {r.id: (r.red, r.flag) for r in df.select(
        "id", redact_pii(F.col("text")).alias("red"),
        has_pii(F.col("text")).alias("flag")).collect()}
    assert got[1] == ("mail me at <EMAIL> please", True)
    assert got[2] == ("call <PHONE> now", True)
    assert got[3] == ("server at <IP> responded", True)
    # version numbers and bare a@b must NOT trip the patterns
    assert got[4] == ("clean text, version 1.2 unharmed, a@b insufficient", False)
    assert got[5] == ("two hits: <EMAIL> and <IP>", True)


def test_dup_word_fraction(spark):
    from dxf_postgis_converter_spark.functions.text import dup_word_fraction

    rows = [(1, "a a a a"), (2, "all words here differ"), (3, "x y x y"), (4, "  ")]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {r.id: r.f for r in df.select(
        "id", F.round(dup_word_fraction(F.col("text")), 6).alias("f")).collect()}
    assert got[1] == 0.75        # 1 distinct of 4
    assert got[2] == 0.0
    assert got[3] == 0.5
    assert got[4] == 0.0         # blank → no repetition signal


def test_transliterate_cjk(spark):
    """CJK layer names romanize in unidecode's format (capitalized
    syllable + trailing space) through BOTH the JVM expression and the
    pure-Python mirror; sanitize_identifier then yields a clean
    table-name stem. Out-of-table CJK passes through (→ '_')."""
    from pyspark.sql import functions as F

    from dxf_postgis_converter_spark.functions.naming import (
        sanitize_identifier, transliterate, transliterate_py,
    )

    cases = {
        "中心线": "Zhong Xin Xian ",
        "墙体图层": "Qiang 体Tu Ceng ",   # 体 not in the curated table
        "门窗-标注": "Men Chuang -Biao Zhu ",
    }
    df = spark.createDataFrame([(s,) for s in cases], ["s"])
    got = {r[0]: r[1] for r in df.select("s", transliterate(F.col("s"))).collect()}
    for s, want in cases.items():
        assert transliterate_py(s) == want, s
        assert got[s] == want, s

    san = {r[0]: r[1] for r in df.select(
        "s", sanitize_identifier(F.col("s"))).collect()}
    assert san["中心线"] == "zhong_xin_xian_"
    assert san["门窗-标注"] == "men_chuang_biao_zhu_"
