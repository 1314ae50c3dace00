"""Unit tests for the pure extraction functions (no Ray)."""

from __future__ import annotations

from pdf_extractor_ray.config import DEFAULT_CONFIG
from pdf_extractor_ray.datagen import make_html, make_pdf, make_tool_markup, _rng
from pdf_extractor_ray.functions.htmlx import extract_html
from pdf_extractor_ray.functions.ids import parse_unit_id, unit_sort_key
from pdf_extractor_ray.functions.normalize import (
    normalize_compare,
    normalize_full,
    strip_solution_prefix,
    unicode_to_latex,
)
from pdf_extractor_ray.functions.pdfx import extract_pdf
from pdf_extractor_ray.functions.refs import context_snippet, detect_references
from pdf_extractor_ray.functions.segment import segment_units
from pdf_extractor_ray.functions.stitch import (
    TurnInput,
    process_conversation,
    stitch_conversation,
)
from pdf_extractor_ray.functions.toolx import extract_tool_markup
from pdf_extractor_ray.stages.turn_extract import extract_turn


# --- HTML --------------------------------------------------------------


def test_html_drops_boilerplate():
    html = (
        "<html><body><nav><ul><li><a href='/'>Home</a></li></ul></nav>"
        "<p>This is the real article content of the page.</p>"
        "<aside>advertisement block here</aside>"
        "<script>var x = 1;</script>"
        "<footer><p>Copyright legal text with enough length</p></footer>"
        "</body></html>"
    )
    text, spans, err = extract_html(html)
    assert text == "This is the real article content of the page."
    assert not err
    assert len(spans) == 1 and spans[0][2] == "html_block"
    s, e, _ = spans[0]
    assert "real article content" in html[s:e]


def test_html_link_density_filter():
    html = (
        "<p><a href='a'>one link</a> <a href='b'>two link</a> and</p>"
        "<p>Normal paragraph with plenty of ordinary words here.</p>"
    )
    text, _, _ = extract_html(html)
    assert text == "Normal paragraph with plenty of ordinary words here."


def test_html_min_length_and_headings():
    text, _, _ = extract_html("<p>tiny</p><h2>Short head</h2>")
    assert text == "Short head"  # headings exempt from min length


def test_html_malformed_degrades():
    text, spans, err = extract_html("just plain text, no tags at all")
    assert text == "" and err


# --- PDF ---------------------------------------------------------------


def test_pdf_roundtrip_paragraphs():
    paras = ["First paragraph of text ends here.", "Second paragraph follows after gap."]
    text, spans, err = extract_pdf(make_pdf(paras))
    assert text == "First paragraph of text ends here.\n\nSecond paragraph follows after gap."
    assert not err


def test_pdf_wrapping_joins_lines_within_paragraph():
    long = "word " * 40  # forces wrapping
    text, _, err = extract_pdf(make_pdf([long.strip() + "."]))
    assert "\n\n" not in text and "\n" in text
    assert text.replace("\n", " ") == long.strip() + "."


def test_pdf_escapes():
    text, _, _ = extract_pdf(make_pdf([r"Set \{x | f(x)\} and (nested) parens."]))
    assert text == r"Set \{x | f(x)\} and (nested) parens."


def test_pdf_malformed():
    assert extract_pdf("%PDF-1.4\ntruncated") == ("", [], True)
    assert extract_pdf("not a pdf at all") == ("", [], True)


# --- tool markup -------------------------------------------------------


def test_tool_fences():
    text, spans, err = extract_tool_markup(
        "[tool:x] run\n```\nhello output\n```\n[exit 0]"
    )
    assert text == "hello output" and not err


def test_tool_json_fence_invalid_excluded():
    text, _, err = extract_tool_markup("```json\n{broken\n```\n```\nok line\n```")
    assert text == "ok line" and err


def test_tool_no_fences_chrome_stripped():
    text, _, err = extract_tool_markup("[tool:x] start\nresult body here\n[exit 0]")
    assert text == "result body here" and not err


def test_tool_empty():
    assert extract_tool_markup("[only chrome]") == ("", [], True)


# --- segmentation ------------------------------------------------------


def test_segment_basic_unit_answer_and_flags():
    frags = segment_units(
        "2.7 Show that the set is a halfspace.\nSolution. Because norms are nonnegative."
    )
    assert len(frags) == 1
    f = frags[0]
    assert (f.unit_id, f.part_id, f.kind) == ("2.7", "", "unit")
    assert f.question == "Show that the set is a halfspace."
    assert f.answer.startswith("Solution.")
    assert not f.continues_next and not f.continued_prev


def test_segment_continuation_flags():
    frags = segment_units("2.8 A question.\nSolution. The proof starts and therefore")
    assert frags[-1].continues_next
    frags2 = segment_units("continuing the proof we conclude the bound holds.")
    assert frags2[0].kind == "cont" and frags2[0].continued_prev
    assert not frags2[0].continues_next


def test_segment_orphan_part_head():
    frags = segment_units("(b) The hyperplane separates the sets.\nSolution. Clear.")
    assert frags[0].kind == "part" and frags[0].part_id == "b" and frags[0].unit_id == ""


def test_segment_parts_within_turn():
    frags = segment_units(
        "3.4a First part question.\nSolution. First answer.\n"
        "(b) Second part question.\nSolution. Second answer."
    )
    assert [(f.unit_id, f.part_id) for f in frags] == [("3.4", "a"), ("3.4", "b")]


def test_segment_content_only():
    frags = segment_units("Standalone note without any unit structure.")
    assert len(frags) == 1 and frags[0].kind == "content"


# --- ids ---------------------------------------------------------------


def test_parse_unit_id_ordering():
    ids = ["2.10", "2.9", "2.18b", "2.18", "2.18a", "10.2"]
    assert sorted(ids, key=unit_sort_key) == ["2.9", "2.10", "2.18", "2.18a", "2.18b", "10.2"]
    assert parse_unit_id("bogus") == (0, 0, "bogus")


# --- normalize ---------------------------------------------------------


def test_unicode_map():
    assert unicode_to_latex("α ≤ β ∈ ℝ") == r"\alpha \leq \beta \in \mathbb{R}"


def test_strip_solution_prefix():
    assert strip_solution_prefix(r"\textbf{Solution.} x") == "x"
    assert strip_solution_prefix("Solution.  y") == "y"
    assert strip_solution_prefix("No prefix") == "No prefix"


def test_normalize_compare():
    assert normalize_compare(r"a  =  b \left( c \right)") == "a=b ( c )"
    assert normalize_compare("x  +  y  -  z") == "x+y-z"


def test_normalize_full_chain():
    assert normalize_full("Solution.  x ≤ y") == r"x \leq y"


# --- refs --------------------------------------------------------------


def test_detect_references_ids_and_generic():
    d = detect_references("Show this using 2.7 and theorem 3", "by the result of 2.8a we win")
    assert d.had_refs
    assert d.ref_ids == ["2.7", "2.8a"]


def test_detect_no_refs():
    d = detect_references("A standalone question.", "An answer.")
    assert not d.had_refs and d.ref_ids == []


def test_context_snippet_first_sentence():
    s = context_snippet("Q", "Solution. First sentence here. Second sentence.")
    assert s == "First sentence here."


# --- stitch fold -------------------------------------------------------


def _turn(idx: int, text: str) -> TurnInput:
    frags, spans, err = extract_turn(text, "")
    return TurnInput(turn_idx=idx, fragments=frags, spans=spans, parse_error=err)


def test_stitch_two_turn_merge():
    rows = process_conversation(
        [
            _turn(0, "2.5 A question.\nSolution. Start of proof and therefore"),
            _turn(1, "continuing we conclude the bound holds."),
        ]
    )
    assert len(rows) == 1
    r = rows[0]
    assert r.unit_id == "2.5" and r.turn_span == (0, 1) and r.continued
    assert "conclude the bound holds" in r.extracted_text


def test_stitch_three_turn_chain():
    rows = process_conversation(
        [
            _turn(0, "2.6 Q.\nSolution. Part one and"),
            _turn(1, "part two which gives"),
            _turn(2, "part three concludes."),
        ]
    )
    assert len(rows) == 1 and rows[0].turn_span == (0, 2)


def test_stitch_nonadjacent_no_merge():
    rows = process_conversation(
        [
            _turn(0, "2.5 Q.\nSolution. Open ended and therefore"),
            _turn(2, "continuing text that cannot attach."),
        ]
    )
    assert len(rows) == 2
    assert rows[1].unit_id == "" and not rows[1].continued


def test_orphan_part_attaches_to_previous_turn_unit():
    rows = process_conversation(
        [
            _turn(0, "2.17a First part.\nSolution. Done."),
            _turn(1, "(b) Second part question.\nSolution. Also done."),
        ]
    )
    assert [r.unit_id for r in rows] == ["2.17a", "2.17b"]


def test_resolution_inlines_context_and_chains():
    rows = process_conversation(
        [
            _turn(0, "2.1 Base fact question.\nSolution. The base fact holds. Extra."),
            _turn(1, "2.2 Harder question using 2.1.\nSolution. Follows."),
            _turn(2, "2.3 Hardest question using 2.2.\nSolution. Follows too."),
        ]
    )
    by_id = {r.unit_id: r for r in rows}
    assert by_id["2.2"].resolved
    assert "[Context from 2.1: The base fact holds.]" in by_id["2.2"].extracted_text
    # chained: 2.3 sees the RESOLVED 2.2 (context snippet is 2.2's answer)
    assert by_id["2.3"].resolved
    assert "[Context from 2.2: Follows.]" in by_id["2.3"].extracted_text


def test_unresolvable_reference():
    rows = process_conversation([_turn(0, "2.1 Q using 9.99.\nSolution. A.")])
    assert rows[0].had_refs and not rows[0].resolved


def test_empty_turn_emits_row_and_breaks_chain():
    rows = process_conversation(
        [
            _turn(0, "2.5 Q.\nSolution. Open and therefore"),
            TurnInput(turn_idx=1, fragments=[], spans=[], parse_error=True),
            _turn(2, "continuing should not attach."),
        ]
    )
    assert len(rows) == 3
    assert rows[1].parse_error and rows[1].extracted_text == ""


# --- generators deterministic -----------------------------------------


def test_generators_deterministic():
    rng = _rng(42, "x")
    rng2 = _rng(42, "x")
    paras = ["Deterministic paragraph one.", "And paragraph two."]
    assert make_html(paras, rng) == make_html(paras, rng2)
    assert make_pdf(paras) == make_pdf(paras)
    assert make_tool_markup(paras, _rng(1)) == make_tool_markup(paras, _rng(1))


# --- bloom / moments (late round-2 query kernels) ----------------------


def test_bloom_positions_deterministic_and_low_fp():
    import numpy as np

    from pdf_extractor_ray.pipelines.queries import _BLOOM_BITS, _bloom_positions

    rng = np.random.default_rng(7)
    members = rng.choice(10_000_000, size=4000, replace=False).astype(np.int64)
    p1, p2 = _bloom_positions(members)
    q1, q2 = _bloom_positions(members)
    assert (p1 == q1).all() and (p2 == q2).all()
    assert p1.min() >= 0 and p1.max() < _BLOOM_BITS
    bits = np.zeros(_BLOOM_BITS // 8, dtype=np.uint8)
    for pos in (p1, p2):
        np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))

    def maybe(keys):
        a, b = _bloom_positions(keys)
        return (
            ((bits[a >> 3] >> (a & 7).astype(np.uint8)) & 1)
            & ((bits[b >> 3] >> (b & 7).astype(np.uint8)) & 1)
        ).astype(bool)

    # no false negatives, ever
    assert maybe(members).all()
    # false-positive rate near the analytic bound for k=2, n=4000, m=2^17
    non = rng.choice(10_000_000, size=100_000, replace=False).astype(np.int64)
    non = np.setdiff1d(non, members)
    fp = maybe(non).mean()
    assert fp < 0.01, fp


def test_moment_partials_match_corrcoef():
    """Merged (n,Σx,Σy,Σx²,Σy²,Σxy) partials reproduce np.corrcoef to
    1e-12 — the q_corr_stats math, independent of Ray."""
    import numpy as np

    rng = np.random.default_rng(11)
    x = rng.normal(25.0, 8.0, size=10_000)
    y = 900.0 * x + rng.normal(0.0, 9000.0, size=10_000) + 15_000.0
    want = np.corrcoef(x, y)[0, 1]

    sx_, sy_ = 25.0, 38_000.0  # the fixed shifts used by q_corr_stats
    parts = np.zeros(6)
    for lo in range(0, 10_000, 1024):  # batch-at-a-time partials
        bx, by = x[lo : lo + 1024] - sx_, y[lo : lo + 1024] - sy_
        parts += [len(bx), bx.sum(), by.sum(), (bx * bx).sum(), (by * by).sum(), (bx * by).sum()]
    n, sx, sy, sxx, syy, sxy = parts
    got = (n * sxy - sx * sy) / np.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert abs(got - want) < 1e-12


def test_hash_values_one_family_per_logical_column():
    """An int64 key column that degraded to float64/object (null or
    pandas conversion) must hash into the SAME space as its int-dtype
    siblings, or merged HLL/CMS estimates silently inflate (ADVICE r2)."""
    import numpy as np

    from pdf_extractor_ray.functions.sketches import hash_values

    ints = np.arange(100, dtype=np.int64)
    as_float = ints.astype(np.float64)
    as_object = np.array([int(x) for x in ints], dtype=object)
    base = hash_values(ints)
    assert np.array_equal(hash_values(as_float), base)
    assert np.array_equal(hash_values(as_object), base)
    # genuinely fractional floats stay in the string family (and are
    # at least self-consistent)
    fr = np.array([0.5, 1.5])
    assert np.array_equal(hash_values(fr), hash_values(fr))
    assert not np.array_equal(hash_values(fr), hash_values(np.array([0, 1])))


def test_levenshtein_banded_matches_full_dp():
    """Banded Levenshtein (the edit_dedup verify kernel) must equal the
    classic full DP whenever the true distance is within the band, and
    return None (reject) exactly when it exceeds it — on str AND bytes
    (byte semantics match DuckDB's levenshtein())."""
    import random

    from pdf_extractor_ray.functions.textstats import levenshtein

    def naive(a, b):
        la, lb = len(a), len(b)
        dp = list(range(lb + 1))
        for i in range(1, la + 1):
            prev, dp[0] = dp[0], i
            for j in range(1, lb + 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
                )
        return dp[lb]

    rng = random.Random(7)
    for _ in range(500):
        a = "".join(rng.choice("abc") for _ in range(rng.randint(0, 12)))
        b = "".join(rng.choice("abc") for _ in range(rng.randint(0, 12)))
        d = naive(a, b)
        assert levenshtein(a, b) == d
        for md in (0, 1, 2, 5):
            assert levenshtein(a, b, md) == (d if d <= md else None)
    # bytes path (what q_edit_dedup feeds it): multibyte char = 2 edits
    assert levenshtein("café".encode(), "cafe".encode()) == 2
    assert levenshtein(b"kitten", b"sitting") == 3


def test_pareto_frontier_semantics():
    """_pareto_frontier must mirror the SQL NOT-EXISTS one-strict
    dominance rule: duplicate frontier points all survive, same-size
    costlier points die, equal-price-larger-size dominates, and the
    combiner law frontier(A∪B) == frontier(frontier(A)∪frontier(B))
    holds on random inputs."""
    import numpy as np
    import pandas as pd

    from pdf_extractor_ray.pipelines.queries import _pareto_frontier

    def naive(df):
        keep = []
        for i, r in df.iterrows():
            dominated = (
                (df["p_size"] >= r.p_size)
                & (df["p_retailprice"] <= r.p_retailprice)
                & ((df["p_size"] > r.p_size) | (df["p_retailprice"] < r.p_retailprice))
            ).any()
            keep.append(not dominated)
        return df.loc[keep]

    rng = np.random.default_rng(3)
    for _ in range(20):
        n = int(rng.integers(1, 60))
        df = pd.DataFrame(
            {
                "p_partkey": np.arange(n),
                "p_size": rng.integers(1, 8, n),
                "p_retailprice": np.round(rng.uniform(1, 5, n), 1),  # force ties
            }
        )
        got = _pareto_frontier(df).sort_values("p_partkey")
        want = naive(df).sort_values("p_partkey")
        pd.testing.assert_frame_equal(got.reset_index(drop=True), want.reset_index(drop=True))
        # combiner law
        half = n // 2
        a, b = df.iloc[:half], df.iloc[half:]
        merged = _pareto_frontier(
            pd.concat([_pareto_frontier(a), _pareto_frontier(b)])
        ).sort_values("p_partkey")
        pd.testing.assert_frame_equal(
            merged.reset_index(drop=True), want.reset_index(drop=True)
        )
