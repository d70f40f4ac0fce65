"""Shared DuckDB SQL fragments mirroring the Spark operators exactly.

Single source of truth for the word lists / constants lives in
``operators.textanalysis`` and ``operators.similarity``; this module
renders their DuckDB-side equivalents so both engines stay in sync.
"""

from __future__ import annotations

from ..operators.similarity import N_PLANES, PLANE_MOD
from ..operators.textanalysis import (
    FINAL_SIGMA,
    LANG_MARKERS,
    LANG_ORDER,
    MEDIAL_SIGMA,
    PUNCT_CLASS,
    STOPWORDS,
    UNICODE_FORMAT_CHARS,
    UNICODE_SPACE_CHARS,
)

HEX = "0123456789abcdef"

# normalized text (whitespace-collapsed lower trim) -- mirrors norm_text()
NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


def unicode_norm_sql(expr: str = "text") -> str:
    """DuckDB mirror of operators.textanalysis.norm_text_unicode: strip
    format chars, unify exotic whitespace (the chars RE2/Java/Python
    ``\\s`` dialects disagree on -- literal enumerations shared with
    the Spark side, so both char classes mean the same thing), then
    the standard NORM collapse, then the final-sigma fold (Spark's
    lower() is contextual, DuckDB's simple -- the one measured
    case-mapping divergence)."""
    stripped = f"regexp_replace({expr}, '[{UNICODE_FORMAT_CHARS}]', '', 'g')"
    unified = f"regexp_replace({stripped}, '[{UNICODE_SPACE_CHARS}]', ' ', 'g')"
    normed = f"trim(regexp_replace(lower({unified}), '\\s+', ' ', 'g'))"
    return f"regexp_replace({normed}, '{FINAL_SIGMA}', '{MEDIAL_SIGMA}', 'g')"


def sql_list(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


def hex8_value(expr: str) -> str:
    """BIGINT value of the first 8 hex chars of md5-ish string `expr`.

    Mirrors the Spark Horner aggregate in operators.dedup / the Python
    int(md5[:8], 16) in operators.similarity.plane_weight.
    """
    terms = []
    for pos in range(1, 9):
        mult = 16 ** (8 - pos)
        terms.append(f"(strpos('{HEX}', substr({expr}, {pos}, 1)) - 1) * {mult}")
    return "(" + " + ".join(terms) + ")"


# ---- text analysis fragments -------------------------------------------

TOKENS = f"string_split({NORM}, ' ')"

N_TOKENS = f"CASE WHEN length({NORM}) = 0 THEN 0 ELSE CAST(len({TOKENS}) AS BIGINT) END"

def _bpe_sql_pattern() -> str:
    from ..operators.textanalysis import BPE_PATTERN

    return BPE_PATTERN.replace("'", "''")


N_BPE_TOKENS = (
    f"CAST(len(regexp_extract_all({NORM}, '{_bpe_sql_pattern()}')) AS BIGINT)"
)

N_PUNCT = (
    f"CAST(length({NORM}) - length(regexp_replace({NORM}, '{PUNCT_CLASS}', '', 'g')) AS BIGINT)"
)

N_STOP = (
    f"CAST(len(list_filter({TOKENS}, t -> t IN ({sql_list(STOPWORDS)}))) AS BIGINT)"
)


def lang_hits(lang: str) -> str:
    return (
        f"CAST(len(list_filter({TOKENS}, t -> t IN ({sql_list(LANG_MARKERS[lang])}))) AS BIGINT)"
    )


def lang_case() -> str:
    """CASE chain equivalent to operators.textanalysis.lang_id."""
    clauses = []
    for idx, lang in enumerate(LANG_ORDER[:-1]):
        later = LANG_ORDER[idx + 1 :]
        cond = " AND ".join(f"{lang}_hits >= {o}_hits" for o in later)
        clauses.append(f"WHEN {cond} THEN '{lang}'")
    return "CASE " + " ".join(clauses) + f" ELSE '{LANG_ORDER[-1]}' END"


# ---- dedup fragments -----------------------------------------------------


def shingle_cte(k: int) -> str:
    """Per-doc distinct k-token shingles (long form) over documents.

    Mirrors operators.dedup.token_shingles: docs with < k tokens yield
    no rows.
    """
    cat = " || ' ' || ".join(f"tk[i + {j}]" for j in range(k))
    return f"""
    tok AS (SELECT doc_id, {TOKENS} AS tk FROM documents),
    sh AS (SELECT DISTINCT doc_id, {cat} AS shingle
           FROM tok, UNNEST(range(1, len(tk) - {k - 1} + 1)) r(i)
           WHERE len(tk) >= {k})
    """


def minhash_ctes(num_hashes: int = 16, band_size: int = 4) -> str:
    """Banded-MinHash CTEs over `sh` mirroring minhash_signatures():
    one md5 per shingle -> x = hex8 % p -> K universal-hash permutations
    (a_j*x+b_j) % p from the SAME constants (operators.dedup.perm_params),
    min per (doc, j), band hash = md5 of the '|'-joined mins in j order.
    Yields CTE `sig(doc_id, band, bh)`.
    """
    from ..operators.dedup import MERSENNE_P, perm_params

    rows = ", ".join(
        f"({j}, {a}, {b})" for j, (a, b) in enumerate(perm_params(num_hashes))
    )
    x = f"{hex8_value('md5(shingle)')} % {MERSENNE_P}"
    return f"""
    perm(j, a, b) AS (VALUES {rows}),
    hv AS (SELECT doc_id, {x} AS x FROM sh),
    mh AS (SELECT doc_id, p.j,
                  min((CAST(p.a AS BIGINT) * x + p.b) % {MERSENNE_P}) AS h
           FROM hv CROSS JOIN perm p GROUP BY doc_id, p.j),
    sig AS (SELECT doc_id, CAST(j // {band_size} AS BIGINT) AS band,
                   md5(string_agg(h::VARCHAR, '|' ORDER BY j)) AS bh
            FROM mh GROUP BY doc_id, j // {band_size})
    """


# ---- similarity fragments -------------------------------------------------


def _plane_weights_cte(dim: int, plane_source: str) -> str:
    """The ONE SQL mirror of operators.similarity.plane_weight(p, i):
    weight = (hex8(md5(p_i)) % PLANE_MOD - half) / 1000. Both plane-set
    shapes below share it so a formula change cannot diverge the frozen
    and staged oracles (review r11); ``plane_source`` supplies the
    plane-index relation ``rp(p)``."""
    hv = hex8_value("md5(p::VARCHAR || '_' || i::VARCHAR)")
    half = (PLANE_MOD - 1) // 2
    return f"""
    w AS (SELECT p, i, ({hv} % {PLANE_MOD} - {half}) / 1000.0 AS wt
          FROM {plane_source}, UNNEST(range(1, {dim} + 1)) ri(i))
    """


def plane_weights_cte(dim: int) -> str:
    """Deterministic hyperplane weights mirroring plane_weight(p, i)."""
    return _plane_weights_cte(dim, f"UNNEST(range(0, {N_PLANES})) rp(p)")


def banded_plane_weights_cte(dim: int, bands: int) -> str:
    """Weights for ``bands`` independent plane sets of corpus-derived
    width -- the banded-LSH mirror of plane_weights_cte. Expects a
    1-row ``ppb(k)`` CTE in scope carrying planes-per-band, exactly as
    operators.dedup.embedding_lsh_candidate_pairs derives it
    (max(8, ceil(log2(n / target_bucket)))); absolute plane index p in
    [0, bands*k) keys plane_weight(p, i) so band b mirrors Spark's
    ``plane_offset = b * k`` slices (band 0 == the frozen planes)."""
    return _plane_weights_cte(dim, f"ppb, UNNEST(range(0, {bands} * k)) rp(p)")


def dims_cte() -> str:
    """Embedding exploded to (vec_id, i, x) with double elements.

    Non-INDEXABLE vectors are excluded entirely: NULL vectors drop
    implicitly (``len(NULL)`` yields no range rows) and vectors with
    NULL ELEMENTS drop via the list_filter guard -- mirroring
    operators.similarity.indexable(), the r10 element-level NULL
    contract. Without the guard a NULL element silently vanishes from
    SQL SUM dot products while Spark's zip_with/aggregate
    null-propagates the whole product (divergent rankings, measured by
    tools/nan_probe.py --mode elemnull). No-op on contract-clean
    corpora: every gate fixture hash is unchanged.
    """
    return """
    dims AS (SELECT vec_id, i, embedding[i]::DOUBLE AS x
             FROM embeddings, UNNEST(range(1, len(embedding) + 1)) r(i)
             WHERE len(list_filter(embedding, e -> e IS NULL)) = 0)
    """
