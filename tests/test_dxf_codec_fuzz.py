"""Mutation fuzz for the pure-Python DXF codec: the 100 TB bulk-ingest
`on_error='skip'` path (sources/dxf_files.py:166) stays alive only if
`parse_dxf` is TOTAL over arbitrary byte garbage — every input must
either return or raise, quickly, never hang or recurse to death — and
if a mutated file still parses, the downstream span extraction must
also complete (a "successful" parse that later kills the extraction
stage would fail the whole job, not skip one file).

Hypothesis drives structured mutations of a valid multi-entity drawing
(line drops/dups/swaps, garbage insertion, truncation, char flips) plus
raw junk text.
"""

from hypothesis import given, settings, strategies as st

from dxf_postgis_converter_spark.sources.dxf_files import (
    spans_from_entity_snapshots,
)
from dxf_postgis_converter_spark.sources.dxf_parser import parse_dxf, write_dxf

_SNAPS = [
    ("LINE", {"layer": "A"},
     {"layer": "A", "start": [0.0, 0.0, 0.0], "end": [1.0, 2.0, 0.0]},
     "10", "A"),
    ("CIRCLE", {"layer": "A"},
     {"layer": "A", "center": [3.0, 4.0, 0.0], "radius": 2.5}, "11", "A"),
    ("LWPOLYLINE", {"layer": "B"},
     {"layer": "B", "is_closed": True,
      "points": [[0.0, 0.0, 0.0, 0.0, 0.5], [5.0, 0.0, 0.0, 0.0, 0.0],
                 [5.0, 5.0, 0.0, 0.0, 0.0]]}, "12", "B"),
    ("TEXT", {"layer": "B"},
     {"layer": "B", "insert": [1.0, 1.0, 0.0], "text": "fuzz", "height": 2.0},
     "13", "B"),
    ("INSERT", {"layer": "C"},
     {"layer": "C", "name": "BLK", "insert": [9.0, 9.0, 0.0],
      "block_name": "BLK", "block_entities": [], "insert_attribs": []},
     "14", "C"),
    # r6: the MULTILEADER context groups (300/301/302/303/304/305 marker
    # state machine) are prime mutation-fuzz territory — dropped or
    # reordered markers must degrade, never hang or throw
    ("MULTILEADER", {"layer": "C"},
     {"layer": "C", "text": "note", "base_point": [1.0, 2.0, 0.0],
      "char_height": 1.5,
      "leader_lines": [[[0.0, 0.0, 0.0], [4.0, 2.0, 0.0]]],
      "leader_properties": [{"attachment_direction": 1,
                             "dogleg_length": 2.0,
                             "dogleg_vector": [1.0, 0.0, 0.0]}]},
     "15", "C"),
]
_BASE = write_dxf(_SNAPS)
_LINES = _BASE.splitlines()
_N = len(_LINES)

# one structured mutation = (op, position, payload)
_mutation = st.tuples(
    st.sampled_from(["drop", "dup", "swap", "replace", "insert", "truncate"]),
    st.integers(0, _N - 1),
    st.text(alphabet=st.characters(min_codepoint=1, max_codepoint=127),
            max_size=12),
)


def _apply(lines, muts):
    out = list(lines)
    for op, pos, payload in muts:
        if not out:
            break
        pos = pos % len(out)
        if op == "drop":
            del out[pos]
        elif op == "dup":
            out.insert(pos, out[pos])
        elif op == "swap":
            j = (pos + 1) % len(out)
            out[pos], out[j] = out[j], out[pos]
        elif op == "replace":
            out[pos] = payload
        elif op == "insert":
            out.insert(pos, payload)
        elif op == "truncate":
            out = out[:pos]
    return "\n".join(out)


def _ingest_contract(text):
    """parse_dxf must return or raise; a successful parse must be
    extractable end-to-end (what on_error='skip' skips is the FILE,
    so anything that parses has to survive the extraction stage)."""
    try:
        _styles, parsed, _blocks = parse_dxf(text)
    except Exception:
        return  # file-granularity skip — fine
    spans = spans_from_entity_snapshots(parsed, _styles)
    assert isinstance(spans, list)
    for s in spans:
        assert isinstance(s["media_ref"], str)


@settings(max_examples=300, deadline=2000)
@given(st.lists(_mutation, min_size=1, max_size=8))
def test_mutated_drawing_parses_or_raises(muts):
    _ingest_contract(_apply(_LINES, muts))


@settings(max_examples=150, deadline=2000)
@given(st.text(alphabet=st.characters(min_codepoint=1, max_codepoint=1000),
               max_size=400))
def test_raw_junk_parses_or_raises(junk):
    _ingest_contract(junk)


def test_base_drawing_still_valid():
    # the fuzz corpus anchor must itself round-trip (guards _SNAPS rot)
    _styles, parsed, _blocks = parse_dxf(_BASE)
    assert [p[0] for p in parsed] == [s[0] for s in _SNAPS]
