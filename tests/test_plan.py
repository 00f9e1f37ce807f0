"""Plan-DSL tests — SURVEY.md §5 category 3: parse/format round-trip,
conflict detection, apply semantics (reference prescription.rs:716-1000)."""

import pytest

from tokenlake.plan import EncodeConfig, PlanError, Prescription

TEXT = """\
# tuning for the tokens table
set file compression zlib(6)
set file max_chunk_rows 65536
set column tokens encoding fsst
set column doc_id dictionary false
set column n_tok encoding delta
"""


def test_parse_and_roundtrip():
    p = Prescription.parse(TEXT)
    assert len(p.directives) == 5
    # format → parse is stable (prescription.rs:935-957 analog)
    p2 = Prescription.parse(p.format())
    assert [d.format() for d in p.directives] == [d.format() for d in p2.directives]


def test_comments_and_blanks_ignored():
    p = Prescription.parse("\n# only a comment\n\nset file max_chunk_rows 10\n")
    assert len(p.directives) == 1


@pytest.mark.parametrize(
    "bad",
    [
        "set tokens encoding dict",                # missing scope
        "set column tokens encoding zstd",         # unknown encoding
        "set file nonsense 4",                     # unknown file prop
        "set column tokens dictionary maybe",      # bad bool
        "set file max_chunk_rows ten",             # not an int
        "get column tokens encoding dict",         # not `set`
        "set column tokens encoding",              # too few tokens
    ],
)
def test_parse_errors_cite_line(bad):
    with pytest.raises(PlanError) as e:
        Prescription.parse(bad)
    assert "line 1" in str(e.value)


def test_conflict_detection():
    p = Prescription.parse(
        "set column tokens encoding dict\nset column tokens encoding rle\n"
    )
    errs = p.validate()
    assert len(errs) == 1 and "conflicting" in errs[0]
    # exact duplicates allowed (prescription.rs:779-818)
    p2 = Prescription.parse(
        "set column tokens encoding dict\nset column tokens encoding dict\n"
    )
    assert p2.validate() == []


def test_apply_last_wins():
    p = Prescription.parse(
        "set column tokens encoding dict\nset column tokens encoding rle\n"
    )
    cfg = p.apply()
    assert cfg.overrides["tokens"] == "rle"  # apply folds in order (…:323-361)


def test_apply_preserves_untouched():
    """X1 preserve-untouched semantics (fix.rs:25-70; e2e analog fix.rs:276-305)."""
    base = EncodeConfig(overrides={"n_tok": "delta"}, max_chunk_rows=1000)
    cfg = Prescription.parse("set column tokens encoding fsst").apply(base)
    assert cfg.overrides["tokens"] == "fsst"
    assert cfg.overrides["n_tok"] == "delta"      # untouched column kept
    assert cfg.max_chunk_rows == 1000
    assert base.overrides == {"n_tok": "delta"}   # base not mutated


def test_apply_full_config():
    cfg = Prescription.parse(TEXT).apply()
    assert cfg.outer_for("anything") == "zlib:6"
    assert cfg.max_chunk_rows == 65536
    assert cfg.overrides["tokens"] == "fsst"
    assert cfg.overrides["!dict:doc_id"] == "1"


def test_merge():
    a = Prescription.parse("set column tokens encoding dict")
    b = Prescription.parse("set file max_chunk_rows 5")
    assert len(a.merged_with(b).directives) == 2
