"""Deterministic derivation spec for the synthetic KG-construction inputs.

The engine's natural inputs (Common-Crawl-style ``pages``, entity ``catalog``
sources, an ``attrs`` transfer map) do not exist in the driver-generated
corpus, so they are DERIVED deterministically from the tables that do
(``documents``, ``part``, ``orders``).  The SAME constants below drive

* the Python/Ray derivation (``ahrd_ray.sources.synth``), and
* the generated DuckDB oracle SQL (``ahrd_ray.pipelines.oracle``),

so the two sides are definitionally comparable.  Every derived numeric value
is an integer or a dyadic rational (denominator a power of two), which keeps
all downstream floating-point reductions exact and order-independent.

Reference analogues: pages ≈ proteins FASTA (Protein.java:63-113), catalog ≈
subject FASTA databases (BlastResult.java:311-373), aliases ≈ the blast hit
tables (BlastResult.java:194-227), attrs ≈ the reference GOA file
(ReferenceGoAnnotations.java:35-75).
"""

from __future__ import annotations

# --- pages ---------------------------------------------------------------
URL_PREFIX = "https://corpus.local/"  # url = URL_PREFIX + lang + '/' + doc_id
WARC_EPOCH = "2025-01-01 00:00:00"  # warc_ts = epoch + doc_id seconds

# --- catalog (from `part`) ----------------------------------------------
# source assignment: p_partkey % 3 -> wide / mid / niche
SOURCE_BY_MOD3 = ("wide", "mid", "niche")
# description decorations (exercise the regex contract):
PUTATIVE_MOD = 11  # prefix 'Putative '      -> description blacklist kill
UNCHAR_MOD = 13  # prefix 'uncharacterized ' -> description blacklist kill
FAMILY_MOD = 4  # append ' family protein'   -> token blacklist drops both
FRAGMENT_MOD = 9  # append ' (Fragment)'     -> filtered out (wide/niche)
OS_MOD = 5  # append ' OS=Synthetica generica' -> filter strips tail
CAND_LEN_BASE = 64  # cand_len = CAND_LEN_BASE + p_size

# --- aliases (mention lexicon) ------------------------------------------
# every word of p_name is a mention; additionally parts with
# p_partkey % ALIAS_MOD < |vocab| get vocab[p_partkey % ALIAS_MOD] as alias,
# where vocab = sorted distinct tokens of the whole corpus text.
ALIAS_MOD = 311

# --- candidate link features (all exact integer / dyadic arithmetic) -----
E_RANK_MULT_P = 37
E_RANK_MULT_D = 13
E_RANK_MOD = 1000
E_RANK_DIV = 1024.0  # power of two -> e_rank is dyadic
MS_MULT_P = 7
MS_MULT_D = 3
MS_MOD = 97
MS_OFF = 3  # match_score in [3, 99], integer-valued
CSTART_MOD = 40  # cand_start = 1 + p_partkey % 40
CEND_MOD = 60  # cand_end = cand_start + 1 + (p_partkey + doc_id) % 60

# --- attrs (from `orders`) ----------------------------------------------
ATTR_KEEP_MOD = 5  # keep rows with o_orderkey % 5 == 0
ATTR_SHORT_SPAN = 2  # short = 'P' + (o_orderkey % (ATTR_SHORT_SPAN * n_parts))
ATTR_VAL_MOD = 37  # attr = 'A' + (o_orderkey % 37)

# --- crawl log (messy URL variants of pages) ------------------------------
# Every page is fetched 1 + doc_id % CRAWL_VAR_MOD times; fetch v differs
# only in URL messiness a canonicalizer must strip (host case, default
# port, trailing slash, tracking params, fragment) plus a KEPT query param
# that depends only on doc_id (so all of a page's fetches normalize to the
# same canonical URL).  warc_ts of fetch v = page ts + v hours.
CRAWL_VAR_MOD = 3
CRAWL_HOST_CASE_MOD = 2  # (doc_id + v) % 2 == 0 -> "Corpus.LOCAL" host
CRAWL_PORT_MOD = 3  # (doc_id + v) % 3 == 0 -> explicit ":443"
CRAWL_SLASH_MOD = 5  # (doc_id + v) % 5 == 0 -> trailing slash
CRAWL_FRAG_MOD = 4  # (doc_id + v) % 4 == 0 -> "#sec{v}"
CRAWL_UTM_SRC_MOD = 5  # odd v -> "utm_source=s{doc_id%5}&utm_medium=m{v}"
CRAWL_REF_MOD = 7  # doc_id % 7 == 0 -> kept param "ref=r{doc_id%4}"
CRAWL_REF_VAL_MOD = 4
TRACKING_PARAM_REGEX = "^(utm_|fbclid|gclid)"

# --- synthetic outlink graph (anchors in the synthesized html) -----------
# Every page carries a canonical <link> naming its own host plus LINK_K
# footer <a rel="oN"> anchors; hosts come from a LINK_HOST_MOD-sized host
# space.  All pure integer arithmetic on doc_id so the DuckDB oracle can
# re-derive the truth from `documents` while the engine genuinely parses
# the html bytes.
LINK_K = 3
LINK_HOST_MOD = 97
LINK_TARGET_MULT = 31
LINK_TARGET_STEP = 7919
LINK_TARGET_MOD = 100003


def link_host(n: int) -> str:
    return f"h{n % LINK_HOST_MOD}.example.org"


def link_target(doc_id: int, j: int) -> int:
    return (doc_id * LINK_TARGET_MULT + j * LINK_TARGET_STEP) % LINK_TARGET_MOD


def link_dst_host(doc_id: int, j: int) -> str:
    """Destination host of anchor j: the SQUARE of the target id folds the
    host space onto its quadratic residues (~half of LINK_HOST_MOD), so
    in-link mass is skewed — roughly half the hosts receive no in-links at
    all — and the host PageRank fixpoint is non-degenerate."""
    t = link_target(doc_id, j)
    return link_host(t * t)


# --- synthetic redirect chains (rel="redirect" <link> in the html head) --
# Pages form canonical-URL rewrite chains along consecutive ids: block
# heads (doc_id % REDIRECT_BLOCK == 0) carry no redirect element at all,
# one id per two blocks (doc_id % REDIRECT_DANGLE_MOD ==
# REDIRECT_DANGLE_RES) points at a non-existent page (a dangling
# redirect), everyone else points at doc_id - 1.  Chain lengths therefore
# range 0..REDIRECT_BLOCK-1 at EVERY corpus size, exercising the resolve
# hop cap, dangling stops and absent links alike.
REDIRECT_BLOCK = 12
REDIRECT_DANGLE_MOD = 24
REDIRECT_DANGLE_RES = 18
REDIRECT_DANGLE_OFF = 1000003


def redirect_target(doc_id: int) -> int | None:
    """Rewrite pointer of a page, or None when the page is a chain head."""
    if doc_id % REDIRECT_BLOCK == 0:
        return None
    if doc_id % REDIRECT_DANGLE_MOD == REDIRECT_DANGLE_RES:
        return doc_id + REDIRECT_DANGLE_OFF
    return doc_id - 1


# --- triple predicates ---------------------------------------------------
PRED_LINKED = "kg:linked_entity"
PRED_DESC = "kg:description"
PRED_QUALITY = "kg:quality"
PRED_LABEL = "kg:label"
PRED_ATTR = "kg:attr"
UNKNOWN_DESC = "unknown"  # analogue of the reference's "Unknown protein"


def source_of_partkey(partkey: int) -> str:
    return SOURCE_BY_MOD3[partkey % 3]


def url_of(doc_id: int, lang: str) -> str:
    return f"{URL_PREFIX}{lang}/{doc_id}"
