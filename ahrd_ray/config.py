"""Typed run configuration (analogue of ahrd.controller.Settings).

The reference loads a single YAML file into a thread-local singleton
(``Settings.java:248-376``).  Here settings are a plain frozen dataclass that
is (a) cheap to ship to Ray workers inside actor constructors and (b) the
single source of truth for BOTH the Ray pipeline and the generated DuckDB
oracle SQL (``ahrd_ray.pipelines.oracle``).

Weights mirror the reference's test configuration
(``test/resources/ahrd_input.yml``): token-score weights 0.5/0.3/0.2, source
weights 100/50/10, description-score bit-score weights 0.2/0.4/0.4.
"""

from __future__ import annotations

import importlib.resources
import math
import re
from dataclasses import dataclass, field


# Token splitter, verbatim contract from BlastResult.java:29
# (TOKEN_SPLITTER_REGEX).  Java and Python regex syntax agree for this
# pattern; the doubled backslash in Java source denotes a literal backslash.
TOKEN_SPLITTER_REGEX = "-|/|;|\\\\|,|:|\"|'|\\.|\\s+|\\||\\(|\\)"

# Short-accession extraction regex, default from Settings.java:95.  The named
# group is called ``shortAccession`` in the reference; Python allows the same
# syntax.
SHORT_ACCESSION_REGEX = "^[^|]+\\|(?P<shortAccession>[^|]+)"

# Quantization used to make floating-point reductions order-independent (and
# therefore deterministic under distributed execution AND bit-identical
# between numpy and DuckDB).  Every non-integer value is snapped to a multiple
# of 2**-20 before entering any sum.  This is a documented deviation from the
# reference (which sums raw doubles in file order); the per-score error is
# < 1e-6 and falls within the P/R >= 0.95 tolerance.
QUANT_BITS = 20
QUANT = float(1 << QUANT_BITS)  # 1048576.0


def q20(x):
    """floor(x * 2^20 + 0.5) / 2^20 — identical in numpy and DuckDB.

    Implemented with ``floor`` (not round) because Python/numpy round
    half-to-even while DuckDB/Java round half-away-from-zero.
    """
    import numpy as np

    return np.floor(np.asarray(x, dtype=np.float64) * QUANT + 0.5) / QUANT


def q20_scalar(x: float) -> float:
    return math.floor(x * QUANT + 0.5) / QUANT


def load_regex_list(name: str) -> list[str]:
    """Load a one-regex-per-line list shipped as package data.

    Mirrors ahrd.controller.Utils.readFile + fromFile (Utils.java:92-101):
    lines are trimmed, empty lines dropped, file order preserved.
    """
    text = (
        importlib.resources.files("ahrd_ray.data").joinpath(name).read_text(encoding="utf-8")
    )
    return [ln.strip() for ln in text.splitlines() if ln.strip()]


@dataclass(frozen=True)
class SourceConfig:
    """Per-catalog-source configuration (analogue of one ``blast_dbs`` entry,
    Settings.java:481-485)."""

    name: str
    weight: int  # blast-db weight (integer, summed into totals)
    description_score_bit_score_weight: float  # dsbs weight
    blacklist_file: str = "blacklist_descline.txt"
    filter_file: str = ""  # defaults to filter_descline_<name>.txt
    token_blacklist_file: str = "blacklist_token.txt"

    @property
    def filter_name(self) -> str:
        return self.filter_file or f"filter_descline_{self.name}.txt"

    def blacklist(self) -> list[str]:
        return load_regex_list(self.blacklist_file)

    def filters(self) -> list[str]:
        return load_regex_list(self.filter_name)

    def token_blacklist(self) -> list[str]:
        return load_regex_list(self.token_blacklist_file)


@dataclass(frozen=True)
class EngineConfig:
    """Whole-run configuration."""

    # Token-score weights (Settings token_score_*_weight; must sum to 1+-1e-3,
    # TokenScoreCalculator.java:187-203).
    token_score_bit_score_weight: float = 0.5
    token_score_database_score_weight: float = 0.3
    token_score_overlap_score_weight: float = 0.2
    # Per-(doc, source) candidate cap (AHRD.java:160 hard-codes 200).
    top_k: int = 200
    # Prefer candidates that carry attribute annotations when choosing the
    # winner (Settings.prefer_reference_with_go_annos;
    # DescriptionScoreCalculator.java:89-98).
    prefer_annotated: bool = False
    # F-beta parameter for the evaluation harness
    # (EvaluationScoreCalculator.java:133-152).
    f_beta: float = 1.0
    sources: tuple[SourceConfig, ...] = (
        SourceConfig("wide", 100, 0.2),
        SourceConfig("mid", 50, 0.4),
        SourceConfig("niche", 10, 0.4),
    )
    # Number of hash partitions used for the doc-keyed scoring shuffle. Sized
    # so each partition holds many docs (vectorized kernel) while giving the
    # scheduler >> num_cluster_cores units of work.
    num_score_partitions: int = 64
    # CPUs reserved per scoring task: the kernel is memory-bandwidth-bound,
    # so running one task per logical core thrashes; 2 CPUs/task halves the
    # concurrency and (measured) halves wall time at 32 cores.
    score_num_cpus: float = 2.0

    def __post_init__(self) -> None:
        s = round(
            self.token_score_bit_score_weight
            + self.token_score_database_score_weight
            + self.token_score_overlap_score_weight,
            9,
        )
        # Tolerate rounding error <= 10^-3 (TokenScoreCalculator.java:192-199)
        if not (0.999 <= s <= 1.001):
            raise ValueError(
                "token-score weights must sum to 1 (+-0.001), got %r" % s
            )

    def source(self, name: str) -> SourceConfig:
        for s in self.sources:
            if s.name == name:
                return s
        raise KeyError(name)

    def source_names(self) -> list[str]:
        return [s.name for s in self.sources]

    def weights_by_source(self) -> dict[str, int]:
        return {s.name: s.weight for s in self.sources}

    def dsbs_by_source(self) -> dict[str, float]:
        return {s.name: s.description_score_bit_score_weight for s in self.sources}


DEFAULT_CONFIG = EngineConfig()

_SHORT_ACC_RE = re.compile(SHORT_ACCESSION_REGEX)


def short_accession(accession: str) -> str:
    """Extract the short accession (BlastResult.java:533-547).

    Falls back to the full accession when the regex does not match (the
    reference warns and continues).
    """
    m = _SHORT_ACC_RE.search(accession)
    return m.group("shortAccession") if m else accession
