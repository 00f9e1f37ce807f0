"""Prescription DSL: the plan IR — parse / validate / apply / format.

Same line-oriented grammar as the reference's prescription DSL
(src/parquet-linter/src/prescription.rs: parse `:282-297`, parse_directive
`:477-498`, conflict keys `:137-173`, validate `:299-321`, apply-last-wins
`:323-361`, CLI warning on conflicts `src/parquet-linter-cli/src/main.rs:75-82`):

    # comment
    set file compression zlib(6)
    set file max_chunk_rows 65536
    set file max_chunk_values 67108864
    set file statistics_truncate_length 64
    set column tokens encoding fsst
    set column tokens compression none
    set column doc_id dictionary false

Directive kinds (13, covering all 12 of the reference's prescription.rs:113-130
with engine-native analogs): file{compression, max_chunk_rows,
max_chunk_values, data_page_size_limit, statistics_truncate_length} and
column{compression, encoding, dictionary, dictionary_page_size_limit,
statistics, bloom_filter, bloom_filter_ndv, bloom_filter_fpp}.

Analog mappings (the engine has chunks, not parquet pages):
- `data_page_size_limit N` (bytes) caps the encode-block payload → effective
  max_chunk_values = N/4 (int32 tokens), min'd with any explicit cap;
- `dictionary_page_size_limit N` caps the dictionary table bytes the selector
  may spend per chunk (R1's growth flow, dictionary_encoding.rs:183-218);
- `statistics none|chunk|page`: none blanks the per-chunk min/max/ndv metrics,
  chunk (default) stores them, page additionally builds the chunk's token
  membership index (bloom) — the engine's finer-than-chunk pruning structure.

Validation marks *conflicts* (same key, different value) as errors; exact
duplicates are allowed (prescription.rs:779-818). `apply` folds in order, so
the last directive wins — mirroring the reference's apply-despite-conflict
semantics.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

INT_ENCODINGS = {"plain", "for", "bitpack", "delta", "rle", "dict", "fsst", "bss"}
STR_ENCODINGS = {"str_plain", "str_dict", "str_prefix"}
ENCODINGS = INT_ENCODINGS | STR_ENCODINGS

# Reference DSL compatibility (prescription.rs:624-636 accepts exactly these
# five parquet encoding names): a prescription file written for the reference
# parses here unchanged, each name mapped to the engine's closest analog.
# `plain` is shared; the rest normalize at parse time so format()/round-trips
# emit engine names.
REFERENCE_ENCODING_ALIASES = {
    "delta_binary_packed": "delta",     # parquet DELTA_BINARY_PACKED ≙ miniblock delta
    "byte_stream_split": "bss",         # real byte-stream-split codec (intcodecs.enc_bss)
    "delta_length_byte_array": "str_plain",  # string body + separate lengths
    "delta_byte_array": "str_prefix",        # front coding = the prefix-sharing analog
}

# same codec grammar as the reference prescription DSL (prescription.rs:583-622)
_COMPRESSION_RE = re.compile(
    r"^(?:none|uncompressed|auto|snappy|lz4|lz4_raw"
    r"|(?P<name>zlib|gzip|zstd|brotli)(?:\((?P<level>\d{1,2})\))?)$"
)
_LEVEL_RANGES = {"zlib": (0, 9), "gzip": (0, 9), "zstd": (1, 22), "brotli": (0, 11)}


@dataclass
class Directive:
    scope: str              # "file" | "column"
    column: str | None      # None for file scope
    prop: str
    value: str

    def conflict_key(self) -> tuple:
        """Directives with the same key but different values conflict
        (prescription.rs:137-173)."""
        return (self.scope, self.column, self.prop)

    def format(self) -> str:
        if self.scope == "file":
            return f"set file {self.prop} {self.value}"
        return f"set column {self.column} {self.prop} {self.value}"


class PlanError(ValueError):
    pass


@dataclass
class EncodeConfig:
    """The WriterProperties analog consumed by encode_job."""

    overrides: dict[str, str] = field(default_factory=dict)  # column -> encoding
    outer: dict[str, str] = field(default_factory=dict)      # column|"" -> outer codec
    bloom: dict[str, dict] = field(default_factory=dict)     # column -> {fpp, ndv}
    stats_level: dict[str, str] = field(default_factory=dict)     # column -> none|chunk|page
    dict_page_limit: dict[str, int] = field(default_factory=dict)  # column -> bytes
    # column -> encode-block byte budget (R10 `small-pages`): list columns
    # under a budget store intra-chunk BLOCKS so a point lookup decodes
    # O(doc) payload bytes, not the chunk (vector_embedding.rs:19-76)
    page_limit: dict[str, int] = field(default_factory=dict)
    # column -> explicit rows-per-block (wins over page_limit): the X1
    # preserve-untouched carrier — plan_from_encoded sniffs a stored
    # blocked column's exact block_rows so compaction / rewrite keeps the
    # random-access layout instead of silently flattening it
    block_rows: dict[str, int] = field(default_factory=dict)
    max_chunk_rows: int | None = None
    max_chunk_values: int | None = None
    data_page_size_limit: int | None = None  # bytes; caps chunk payload
    statistics_truncate_length: int | None = None

    def outer_for(self, column: str) -> str:
        return self.outer.get(column, self.outer.get("", "auto"))

    def bloom_for(self, column: str) -> dict | None:
        """Bloom params for a column, or None when not directed (reference
        default: bloom only when present/prescribed, fix.rs:168-182).
        `statistics page` also turns the membership index on."""
        b = self.bloom.get(column)
        if b is None and self.stats_level.get(column) == "page":
            return {"fpp": 0.01, "ndv": None}
        return b

    def stats_for(self, column: str) -> str:
        return self.stats_level.get(column, "chunk")

    def dict_limit_for(self, column: str) -> int | None:
        return self.dict_page_limit.get(column)

    def page_limit_for(self, column: str) -> int | None:
        return self.page_limit.get(column)

    def block_rows_for(self, column: str) -> int | None:
        return self.block_rows.get(column)

    def effective_max_values(self, default: int) -> int:
        """max_chunk_values folded with the data_page_size_limit byte cap."""
        v = self.max_chunk_values or default
        if self.data_page_size_limit is not None:
            v = min(v, max(1, self.data_page_size_limit // 4))
        return v


@dataclass
class Prescription:
    directives: list[Directive] = field(default_factory=list)

    @classmethod
    def parse(cls, text: str) -> "Prescription":
        out = []
        for lineno, raw in enumerate(text.splitlines(), 1):
            line = raw.split("#", 1)[0].strip()
            if not line:
                continue
            parts = line.split()
            if parts[0] != "set" or len(parts) < 4:
                raise PlanError(f"line {lineno}: expected `set file|column ...`: {raw!r}")
            if parts[1] == "file":
                if len(parts) != 4:
                    raise PlanError(f"line {lineno}: `set file PROP VALUE`: {raw!r}")
                d = Directive("file", None, parts[2], parts[3])
            elif parts[1] == "column":
                if len(parts) != 5:
                    raise PlanError(f"line {lineno}: `set column COL PROP VALUE`: {raw!r}")
                d = Directive("column", parts[2], parts[3], parts[4])
            else:
                raise PlanError(f"line {lineno}: unknown scope {parts[1]!r}")
            _check_directive(d, lineno)
            out.append(d)
        return cls(out)

    def validate(self) -> list[str]:
        """Conflicting keys with differing values → error strings."""
        seen: dict[tuple, str] = {}
        errors = []
        for d in self.directives:
            k = d.conflict_key()
            if k in seen and seen[k] != d.value:
                errors.append(
                    f"conflicting directives for {k}: {seen[k]!r} vs {d.value!r}"
                )
            seen[k] = d.value
        return errors

    def apply(self, base: EncodeConfig | None = None) -> EncodeConfig:
        """Fold directives into an EncodeConfig; last directive wins.
        Untouched settings keep their `base` values (X1 preserve-untouched
        semantics, reference fix.rs:25-70)."""
        cfg = base or EncodeConfig()
        cfg = EncodeConfig(
            overrides=dict(cfg.overrides),
            outer=dict(cfg.outer),
            bloom={k: dict(v) for k, v in cfg.bloom.items()},
            stats_level=dict(cfg.stats_level),
            dict_page_limit=dict(cfg.dict_page_limit),
            page_limit=dict(cfg.page_limit),
            block_rows=dict(cfg.block_rows),
            max_chunk_rows=cfg.max_chunk_rows,
            max_chunk_values=cfg.max_chunk_values,
            data_page_size_limit=cfg.data_page_size_limit,
            statistics_truncate_length=cfg.statistics_truncate_length,
        )
        for d in self.directives:
            if d.scope == "file":
                if d.prop == "compression":
                    cfg.outer[""] = _norm_outer(d.value)
                elif d.prop == "max_chunk_rows":
                    cfg.max_chunk_rows = int(d.value)
                elif d.prop == "max_chunk_values":
                    cfg.max_chunk_values = int(d.value)
                elif d.prop == "data_page_size_limit":
                    cfg.data_page_size_limit = int(d.value)
                elif d.prop == "statistics_truncate_length":
                    cfg.statistics_truncate_length = int(d.value)
            else:
                if d.prop == "encoding":
                    cfg.overrides[d.column] = d.value
                elif d.prop == "compression":
                    cfg.outer[d.column] = _norm_outer(d.value)
                elif d.prop == "dictionary":
                    if d.value == "true":
                        cfg.overrides[d.column] = (
                            "str_dict" if d.column in ("doc_id", "source") else "dict"
                        )
                    else:
                        # disable dict: fall back to auto-selection minus dict
                        cfg.overrides.pop(d.column, None)
                        cfg.overrides[f"!dict:{d.column}"] = "1"
                elif d.prop == "statistics":
                    cfg.stats_level[d.column] = d.value
                elif d.prop == "dictionary_page_size_limit":
                    cfg.dict_page_limit[d.column] = int(d.value)
                elif d.prop == "data_page_size_limit":
                    cfg.page_limit[d.column] = int(d.value)
                elif d.prop == "bloom_filter":
                    if d.value == "true":
                        cfg.bloom.setdefault(d.column, {"fpp": 0.01, "ndv": None})
                    else:
                        cfg.bloom.pop(d.column, None)
                elif d.prop == "bloom_filter_ndv":
                    cfg.bloom.setdefault(d.column, {"fpp": 0.01, "ndv": None})["ndv"] = int(d.value)
                elif d.prop == "bloom_filter_fpp":
                    cfg.bloom.setdefault(d.column, {"fpp": 0.01, "ndv": None})["fpp"] = float(d.value)
        return cfg

    def format(self) -> str:
        return "\n".join(d.format() for d in self.directives)

    def merged_with(self, other: "Prescription") -> "Prescription":
        return Prescription(self.directives + other.directives)


def _norm_outer(v: str) -> str:
    """Normalize DSL codec syntax (`zstd(3)`, `lz4`, `uncompressed`) to the
    container's `name[:level]` form; validates level ranges like the
    reference parser (prescription.rs:583-622)."""
    if v in ("none", "uncompressed"):
        return "none"
    if v == "auto":
        return "auto"
    m = _COMPRESSION_RE.match(v)
    if not m:
        raise PlanError(f"bad compression value {v!r}")
    name = m.group("name")
    if name is None:
        return "lz4" if v == "lz4_raw" else v  # snappy / lz4 (no level)
    level = m.group("level")
    if level is not None:
        lo, hi = _LEVEL_RANGES[name]
        if not lo <= int(level) <= hi:
            raise PlanError(f"{name} level out of range [{lo},{hi}]: {v!r}")
        return f"{name}:{int(level)}"
    return name


def _check_directive(d: Directive, lineno: int) -> None:
    file_props = {
        "compression", "max_chunk_rows", "max_chunk_values",
        "data_page_size_limit", "statistics_truncate_length",
    }
    col_props = {
        "compression", "encoding", "dictionary",
        "statistics", "dictionary_page_size_limit", "data_page_size_limit",
        "bloom_filter", "bloom_filter_ndv", "bloom_filter_fpp",
    }
    if d.scope == "file":
        if d.prop not in file_props:
            raise PlanError(f"line {lineno}: unknown file property {d.prop!r}")
        if d.prop == "compression":
            _norm_outer(d.value)
        elif not d.value.isdigit() or int(d.value) < 1:
            # 0 would either vanish into `cfg.x or default` falsy fallbacks
            # (a silent no-op) or cap chunks at one value — reject like the
            # column-level integer props do
            raise PlanError(f"line {lineno}: {d.prop} expects an integer ≥ 1, got {d.value!r}")
    else:
        if d.prop not in col_props:
            raise PlanError(f"line {lineno}: unknown column property {d.prop!r}")
        if d.prop == "encoding":
            d.value = REFERENCE_ENCODING_ALIASES.get(d.value, d.value)
            if d.value not in ENCODINGS:
                raise PlanError(f"line {lineno}: unknown encoding {d.value!r}")
        if d.prop in ("dictionary", "bloom_filter") and d.value not in ("true", "false"):
            raise PlanError(f"line {lineno}: {d.prop} expects true/false")
        if d.prop == "statistics" and d.value not in ("none", "chunk", "page"):
            raise PlanError(f"line {lineno}: statistics expects none|chunk|page")
        if d.prop in ("dictionary_page_size_limit", "data_page_size_limit") and (
            not d.value.isdigit() or int(d.value) < 1
        ):
            raise PlanError(f"line {lineno}: {d.prop} expects an integer ≥ 1")
        if d.prop == "bloom_filter_ndv" and (not d.value.isdigit() or int(d.value) < 1):
            # ndv=0 would divide by zero in build_bloom's k sizing — reject
            # at parse time, not inside the encode UDF
            raise PlanError(f"line {lineno}: bloom_filter_ndv expects an integer ≥ 1")
        if d.prop == "bloom_filter_fpp":
            try:
                fpp = float(d.value)
            except ValueError:
                fpp = -1.0
            if not 0.0 < fpp < 1.0:
                raise PlanError(f"line {lineno}: bloom_filter_fpp expects a float in (0,1)")
        if d.prop == "compression":
            _norm_outer(d.value)


def plan_from_decisions(decisions: list[dict]) -> Prescription:
    """Decisions DataFrame rows → prescription text (the lint → DSL export
    path, reference cli/main.rs:103-118)."""
    dirs = []
    for r in decisions:
        dirs.append(Directive("column", r["column"], "encoding", r["codec"]))
    return Prescription(dirs)


# R10's physical page budget for random access over high-fanout embedding
# columns (reference vector_embedding.rs:19-76 prescribes 256 KiB pages)
R10_PAGE_BYTES = 256 * 1024


def plan_from_r10(decisions: list[dict], column: str) -> Prescription:
    """R10 `small-pages` decision rows → the physical directive: a
    per-column data_page_size_limit that makes the encoder store the list
    column in independently decodable blocks (FLAG_BLOCKED), so a point
    lookup decodes O(doc) bytes. Round-trips through the DSL: the returned
    prescription's .format() parses back into the same EncodeConfig knob."""
    if any(r.get("decision") == "small-pages" for r in decisions):
        return Prescription(
            [Directive("column", column, "data_page_size_limit", str(R10_PAGE_BYTES))]
        )
    return Prescription([])
