"""String functions F1-F4 (SURVEY §2.8): transliteration, short-id,
table-name templating, handle normalization.

The reference uses `unidecode` for layer names (import_use_case.py:31-33)
and derives table names `l{short_id}_{base}` from the first 6 hex chars of
the document UUID (import_use_case.py:35-40, 52-93). unidecode is not
available here; for the Cyrillic+Latin layer-name domain of the corpus the
GOST-style map below reproduces unidecode's output for every character the
reference fixtures use. It is applied as a chain of JVM `replace`
expressions — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# unidecode-compatible Cyrillic→Latin (unidecode's x000/x004 tables)
CYR = {
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "е": "e", "ё": "e",
    "ж": "zh", "з": "z", "и": "i", "й": "i", "к": "k", "л": "l", "м": "m",
    "н": "n", "о": "o", "п": "p", "р": "r", "с": "s", "т": "t", "у": "u",
    "ф": "f", "х": "kh", "ц": "ts", "ч": "ch", "ш": "sh", "щ": "shch",
    "ъ": "", "ы": "y", "ь": "", "э": "e", "ю": "iu", "я": "ia",
    "А": "A", "Б": "B", "В": "V", "Г": "G", "Д": "D", "Е": "E", "Ё": "E",
    "Ж": "Zh", "З": "Z", "И": "I", "Й": "I", "К": "K", "Л": "L", "М": "M",
    "Н": "N", "О": "O", "П": "P", "Р": "R", "С": "S", "Т": "T", "У": "U",
    "Ф": "F", "Х": "Kh", "Ц": "Ts", "Ч": "Ch", "Ш": "Sh", "Щ": "Shch",
    "Ъ": "", "Ы": "Y", "Ь": "", "Э": "E", "Ю": "Iu", "Я": "Ia",
}

# unidecode-compatible accented-Latin (unidecode's x000/x001 tables):
# diacritic strip for the common Latin-1 / Latin-Extended-A range plus the
# multi-char specials. Extends F1 parity beyond the Cyrillic fixture
# domain (VERDICT r2 "what's missing" item 2 — CJK remains env-gated).
LAT = {
    "á": "a", "à": "a", "â": "a", "ä": "a", "ã": "a", "å": "a", "ā": "a",
    "ă": "a", "ą": "a", "é": "e", "è": "e", "ê": "e", "ë": "e", "ē": "e",
    "ě": "e", "ę": "e", "í": "i", "ì": "i", "î": "i", "ï": "i", "ī": "i",
    "ó": "o", "ò": "o", "ô": "o", "ö": "o", "õ": "o", "ø": "o", "ő": "o",
    "ú": "u", "ù": "u", "û": "u", "ü": "u", "ū": "u", "ů": "u", "ű": "u",
    "ý": "y", "ÿ": "y", "ñ": "n", "ń": "n", "ň": "n", "ç": "c", "ć": "c",
    "č": "c", "š": "s", "ś": "s", "ž": "z", "ź": "z", "ż": "z", "ł": "l",
    "đ": "d", "ď": "d", "ť": "t", "ř": "r", "ð": "d",
    "ş": "s", "ğ": "g", "ı": "i",
    "Á": "A", "À": "A", "Â": "A", "Ä": "A", "Ã": "A", "Å": "A", "Ā": "A",
    "Ă": "A", "Ą": "A", "É": "E", "È": "E", "Ê": "E", "Ë": "E", "Ē": "E",
    "Ě": "E", "Ę": "E", "Í": "I", "Ì": "I", "Î": "I", "Ï": "I", "Ī": "I",
    "Ó": "O", "Ò": "O", "Ô": "O", "Ö": "O", "Õ": "O", "Ø": "O", "Ő": "O",
    "Ú": "U", "Ù": "U", "Û": "U", "Ü": "U", "Ū": "U", "Ů": "U", "Ű": "U",
    "Ý": "Y", "Ñ": "N", "Ń": "N", "Ň": "N", "Ç": "C", "Ć": "C", "Č": "C",
    "Š": "S", "Ś": "S", "Ž": "Z", "Ź": "Z", "Ż": "Z", "Ł": "L", "Đ": "D",
    "Ď": "D", "Ť": "T", "Ř": "R", "Ð": "D",
    "Ş": "S", "Ğ": "G", "İ": "I",
    "ß": "ss", "æ": "ae", "œ": "oe", "þ": "th",
    "Æ": "AE", "Œ": "OE", "Þ": "Th",
}

# CJK → pinyin romanization in unidecode's output format (capitalized
# syllable + trailing space, e.g. 中 → "Zhong "): a curated table for the
# CAD layer-name vocabulary domain (walls/doors/axes/dimensions/…), NOT
# the full unidecode x4e-x9f table — characters outside it pass through
# unchanged and sanitize_identifier turns them into '_' exactly as
# before. Closes the CJK share of F1 for the names a DXF corpus
# actually uses; full-table parity still needs unidecode itself.
CJK = {
    "图": "Tu ", "层": "Ceng ", "墙": "Qiang ", "门": "Men ",
    "窗": "Chuang ", "柱": "Zhu ", "梁": "Liang ", "板": "Ban ",
    "楼": "Lou ", "梯": "Ti ", "标": "Biao ", "注": "Zhu ",
    "文": "Wen ", "字": "Zi ", "尺": "Chi ", "寸": "Cun ",
    "轴": "Zhou ", "线": "Xian ", "中": "Zhong ", "心": "Xin ",
    "家": "Jia ", "具": "Ju ", "电": "Dian ", "气": "Qi ",
    "水": "Shui ", "暖": "Nuan ", "通": "Tong ", "风": "Feng ",
    "结": "Jie ", "构": "Gou ", "建": "Jian ", "筑": "Zhu ",
    "平": "Ping ", "面": "Mian ", "立": "Li ", "剖": "Pou ",
    "详": "Xiang ", "总": "Zong ", "地": "Di ", "基": "Ji ",
    "础": "Chu ", "顶": "Ding ", "底": "Di ", "外": "Wai ",
    "内": "Nei ", "新": "Xin ", "旧": "Jiu ", "号": "Hao ",
}

# the full F1 mapping — single source of truth for the JVM expression,
# the pure-Python mirror AND the DuckDB oracle chain (__spark_entry__)
TRANSLIT = {**CYR, **LAT, **CJK}

_ONE = {k: v for k, v in TRANSLIT.items() if len(v) == 1}
_DEL = [k for k, v in TRANSLIT.items() if v == ""]
_MANY = {k: v for k, v in TRANSLIT.items() if len(v) > 1}
# every 1:many entry becomes ONE nested replace() in the DuckDB oracle
# twin (__spark_entry__._translit_sql); DuckDB's binder recurses ~128
# deep, so keep headroom — grow _ONE freely, grow _MANY deliberately
assert len(_MANY) <= 110, "replace chain nearing DuckDB binder depth"


def transliterate(col: Column) -> Column:
    """F1: unidecode-equivalent for the Cyrillic + accented-Latin domain.
    One JVM ``translate`` pass handles every 1:1 mapping and deletion
    (deleted chars sit past the end of the dst string); the few 1:many
    specials (Ж→Zh, ß→ss, …) are chained replaces. Fully codegen'd."""
    out = F.translate(col, "".join(_ONE) + "".join(_DEL), "".join(_ONE.values()))
    for src, dst in _MANY.items():
        out = F.replace(out, F.lit(src), F.lit(dst))
    return out


def transliterate_py(s: str) -> str:
    """Pure-Python mirror (tests, oracle generation)."""
    return "".join(TRANSLIT.get(ch, ch) for ch in s)


def short_id(doc_id: Column) -> Column:
    """F2: strip dashes, first 6 chars of the UUID (import_use_case.py:35-40)."""
    return F.substring(F.regexp_replace(doc_id, "-", ""), 1, 6)


def sanitize_identifier(col: Column) -> Column:
    """Lower, non [a-z0-9_] → _, collapse repeats — matches the reference's
    table-name sanitation in import_use_case.py:52-93."""
    c = F.lower(transliterate(col))
    c = F.regexp_replace(c, "[^a-z0-9_]+", "_")
    return F.regexp_replace(c, "_+", "_")


def table_name(doc_id: Column, layer: Column, use_prefix: bool = True) -> Column:
    """F3: `l{short}_{base}` templating (import_use_case.py:52-93)."""
    base = sanitize_identifier(layer)
    if not use_prefix:
        return base
    return F.concat(F.lit("l"), short_id(doc_id), F.lit("_"), base)


def normalize_handle(col: Column, lower: bool = True) -> Column:
    """F4: strip + case-normalize. NB the reference lowers in the selector
    (area_selector.py:27) but UPPERS in writer/import (dxf_writer.py:34,
    import_use_case.py:692) — both directions exposed."""
    t = F.trim(col)
    return F.lower(t) if lower else F.upper(t)


def unescape_dxf_unicode_py(s: str) -> str:
    """F5: DXF \\U+XXXX unescape (legacy fnc4ADXF2Shape.py:60-74)."""
    import re

    return re.sub(r"\\U\+([0-9A-Fa-f]{4})", lambda m: chr(int(m.group(1), 16)), s)


def helmert_fit(p1_src, p1_dst, p2_src, p2_dst):
    """F7: 4-parameter conformal transform from 2 control points
    (TransformTools.py:93-171): returns (a, b, dx, dy) with
    x' = dx + a·x − b·y ; y' = dy + b·x + a·y."""
    sx1, sy1 = p1_src
    sx2, sy2 = p2_src
    dx1, dy1 = p1_dst
    dx2, dy2 = p2_dst
    du, dv = sx2 - sx1, sy2 - sy1
    dU, dV = dx2 - dx1, dy2 - dy1
    den = du * du + dv * dv
    a = (du * dU + dv * dV) / den
    b = (du * dV - dv * dU) / den
    tx = dx1 - a * sx1 + b * sy1
    ty = dy1 - b * sx1 - a * sy1
    return a, b, tx, ty


def helmert_apply(x: Column, y: Column, params) -> tuple[Column, Column]:
    """Apply fitted Helmert params as column expressions."""
    a, b, tx, ty = params
    return (F.lit(tx) + F.lit(a) * x - F.lit(b) * y,
            F.lit(ty) + F.lit(b) * x + F.lit(a) * y)
