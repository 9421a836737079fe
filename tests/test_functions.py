"""Unit tests for the pure kernel layer (no Ray needed)."""

from __future__ import annotations

from datetime import datetime

from temporal_knowledge_graphs_ray.functions.chunking import chunk_text
from temporal_knowledge_graphs_ray.functions.dates import (
    fiscal_period_end,
    month_to_quarter,
    normalize_quarter,
    parse_date,
)
from temporal_knowledge_graphs_ray.functions.embed import cosine, embed_text
from temporal_knowledge_graphs_ray.functions.hashing import (
    hamming64,
    jaccard,
    md5_hex,
    minhash_bands,
    minhash_signature,
    simhash64,
    stable_hash64,
    word_shingles,
)
from temporal_knowledge_graphs_ray.functions.html_text import (
    extract_text_from_html,
    normalize_text_lines,
)
from temporal_knowledge_graphs_ray.functions.jaro_winkler import jaro_winkler
from temporal_knowledge_graphs_ray.functions.ner import extract_entities
from temporal_knowledge_graphs_ray.functions.normalize import (
    normalize_entity_name,
    simplify_entity_name,
    surface_key,
)
from temporal_knowledge_graphs_ray.functions.relations import (
    extract_quads,
    merge_duplicate_relations,
)
from temporal_knowledge_graphs_ray.functions.sentences import split_sentences
from temporal_knowledge_graphs_ray.functions.textstats import (
    detect_language,
    fingerprint,
    quality_signals,
)
from temporal_knowledge_graphs_ray.functions.tokenize import (
    count_tokens,
    estimate_chunks,
    token_spans,
    tokenize,
)


class TestHtmlText:
    def test_basic(self):
        html = "<html><body><p>Hello world.</p></body></html>"
        assert extract_text_from_html(html) == "Hello world."

    def test_script_style_dropped(self):
        html = (
            "<html><head><title>T</title><style>p {color: red}</style>"
            "<script>var x = 'ignored';</script></head>"
            "<body><p>Keep me.</p><script>also dropped</script></body></html>"
        )
        assert extract_text_from_html(html) == "T\nKeep me."

    def test_whitespace_and_entities(self):
        html = (
            "<body>\n\n  <p>  spaced   out  </p>\n"
            "<div>a &amp; b &lt;ok&gt;</div>\n<p></p>\n</body>"
        )
        assert extract_text_from_html(html) == "spaced   out\na & b <ok>"

    def test_multiline_text_node(self):
        html = "<p>line one\n   line two\n\n</p><p>three</p>"
        assert extract_text_from_html(html) == "line one\nline two\nthree"

    def test_nested_and_bytes(self):
        html = b"<div><span>a</span><b>b</b></div>"
        assert extract_text_from_html(html) == "a\nb"

    def test_normalize_text_lines(self):
        assert normalize_text_lines("  a \n\n  \n b\t\nc") == "a\nb\nc"


class TestTokenize:
    def test_tokens(self):
        assert tokenize("Hello, world! It's 42.") == [
            "Hello", ",", "world", "!", "It", "'", "s", "42", ".",
        ]

    def test_spans_roundtrip(self):
        text = "ab, cd  ef"
        spans = token_spans(text)
        assert [text[s:e] for s, e in spans] == ["ab", ",", "cd", "ef"]

    def test_count_and_estimate(self):
        assert count_tokens("a b c") == 3
        assert estimate_chunks(100, 10, 2) == 13
        assert estimate_chunks(0, 10, 2) == 1


class TestSentences:
    def test_split(self):
        text = "One. Two!  Three? Four"
        assert split_sentences(text) == ["One.", "Two!", "Three?", "Four"]

    def test_no_split_inside(self):
        assert split_sentences("Hello world") == ["Hello world"]


class TestChunking:
    def test_single_chunk(self):
        rows = chunk_text("Short sentence. Another one.", chunk_size=100,
                          chunk_overlap=10)
        assert len(rows) == 1
        assert rows[0].text == "Short sentence. Another one."
        assert rows[0].chunk_index == 0

    def test_packing_and_overlap(self):
        # 5 sentences of 5 tokens each (4 words + period); size 12 fits 2
        sents = [f"w{i}a w{i}b w{i}c w{i}d." for i in range(5)]
        text = " ".join(sents)
        rows = chunk_text(text, chunk_size=12, chunk_overlap=6)
        assert len(rows) >= 2
        # overlap: each later chunk starts with the previous chunk's last sentence
        for prev, cur in zip(rows, rows[1:]):
            last_sent = split_sentences(prev.text)[-1]
            assert cur.text.startswith(last_sent)
        assert [r.chunk_index for r in rows] == list(range(len(rows)))

    def test_long_sentence_windowed(self):
        text = " ".join(f"tok{i}" for i in range(50))  # one 50-token "sentence"
        rows = chunk_text(text, chunk_size=20, chunk_overlap=5)
        assert len(rows) == 4  # stride 15: starts 0,15,30,45
        assert rows[0].token_count == 20

    def test_fixed_strategy(self):
        text = " ".join(f"tok{i}" for i in range(30))
        rows = chunk_text(text, chunk_size=10, chunk_overlap=2, strategy="fixed")
        assert [r.chunk_index for r in rows] == list(range(len(rows)))
        assert rows[0].token_count == 10
        # stride 8: starts 0, 8, 16, 24 -> 4 chunks
        assert len(rows) == 4


class TestNormalize:
    def test_normalize(self):
        assert normalize_entity_name("  Acme   Corp.. ") == "Acme Corp"
        assert normalize_entity_name("X;") == "X"

    def test_simplify(self):
        assert simplify_entity_name("Acme Inc.") == "Acme"
        assert simplify_entity_name("The Acme Corporation") == "Acme"
        assert simplify_entity_name("Dr. Jane Doe") == "Jane Doe"

    def test_surface_key(self):
        assert surface_key("  The  Acme   Inc. ") == "acme"


class TestJaroWinkler:
    def test_identical(self):
        assert jaro_winkler("abc", "ABC ") == 1.0

    def test_empty(self):
        assert jaro_winkler("", "x") == 0.0

    def test_known_value(self):
        # classic MARTHA/MARHTA: jaro 0.944..., prefix 3 -> 0.9611...
        assert abs(jaro_winkler("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12

    def test_disjoint(self):
        assert jaro_winkler("abc", "xyz") == 0.0


class TestDates:
    def test_parse(self):
        assert parse_date("2021-03-05") == datetime(2021, 3, 5)
        assert parse_date("2021") == datetime(2021, 1, 1)
        assert parse_date("null") is None
        assert parse_date("not a date") is None

    def test_quarters(self):
        assert normalize_quarter("q3") == "Q3"
        assert normalize_quarter(2) == "Q2"
        assert normalize_quarter("Q7") is None
        assert fiscal_period_end(2021, "Q1") == datetime(2021, 3, 31)
        assert fiscal_period_end(2021, "q4") == datetime(2021, 12, 31)
        assert month_to_quarter(5) == "Q2"


class TestNer:
    def test_org_suffix_and_person(self):
        text = "Alice Johnson founded Acme Inc. in 2015."
        rows = extract_entities(text)
        by_name = {(r["name"], r["type"]) for r in rows}
        assert ("Alice Johnson", "PERSON") in by_name
        assert ("Acme Inc", "ORGANIZATION") in by_name
        assert ("2015", "DATE") in by_name

    def test_money_percent(self):
        rows = extract_entities("Revenue was $12.5 million, up 14% in Q3 2021.")
        types = {r["type"] for r in rows}
        assert {"MONEY", "PERCENT", "DATE"} <= types

    def test_acronym_camelcase(self):
        rows = extract_entities("MIT partnered with OpenAI.")
        names = {r["name"] for r in rows}
        assert {"MIT", "OpenAI"} <= names

    def test_location_cue(self):
        rows = extract_entities("Globex Corporation is headquartered in Berlin.")
        d = {r["name"]: r["type"] for r in rows}
        assert d.get("Berlin") == "LOCATION"

    def test_position_and_count(self):
        text = "Acme Inc. hired staff. Acme Inc. grew."
        rows = extract_entities(text)
        acme = next(r for r in rows if r["name"] == "Acme Inc")
        assert acme["mention_count"] == 2
        assert acme["position"] == text.lower().find("acme inc")

    def test_sentence_start_not_entity(self):
        rows = extract_entities("The market grew. This was expected.")
        assert all(r["type"] in ("DATE",) or r["name"] not in ("The", "This")
                   for r in rows)

    def test_person_cue_with_long_token(self):
        """The person cue's ``of \\S+`` token is unbounded in chars — the
        look-back must scan TOKENS, not a fixed char window, or a long URL
        between 'of' and 'is' flips PERSON to ORGANIZATION."""
        long_tok = "https://example.com/" + "x" * 300
        rows = extract_entities(f"The CEO of {long_tok} is John Smith")
        d = {r["name"]: r["type"] for r in rows}
        assert d.get("John Smith") == "PERSON"

    def test_lookback_equals_full_prefix_search(self):
        """Token-bounded look-back classifies IDENTICALLY to a search over
        the entire prefix (the pre-fast-path semantics) on generated text."""
        import random

        import temporal_knowledge_graphs_ray.functions.ner as N

        def classify_full_prefix(text, m):
            seq, start = m.group(0), m.start()
            tokens = seq.split()
            if N._LOCATION_CUE_BEFORE.search(text, 0, start):
                return "LOCATION"
            if any(t in N._ORG_SUFFIX_TOKENS for t in tokens[1:]) or (
                    len(tokens) == 1 and tokens[0] in N._ORG_SUFFIX_TOKENS):
                return "ORGANIZATION"
            if len(tokens) == 1:
                tok = tokens[0]
                if tok in N._COMMON_WORDS:
                    return None
                if len(tok) >= 2 and tok.isupper() and tok.isalpha():
                    return "ORGANIZATION"
                if any(c.isupper() for c in tok[1:]) and any(
                        c.islower() for c in tok):
                    return "ORGANIZATION"
                return None
            person_shaped = (2 <= len(tokens) <= 3 and all(
                t.isalpha() and t[0].isupper() and t[1:].islower()
                for t in tokens))
            if person_shaped:
                if (text[:start].rstrip().endswith(N._HONORIFICS)
                        or N._PERSON_VERBS_AFTER.match(text, m.end())
                        or N._PERSON_CUE_BEFORE.search(text, 0, start)):
                    return "PERSON"
            return "ORGANIZATION"

        rng = random.Random(42)
        words = ["the", "CEO", "CTO", "of", "is", "based", "in",
                 "headquartered", "Dr.", "Mr.", "Alice", "Bob", "Smith",
                 "Jones", "Acme", "Corp", "x" * 300, "y" * 50, "founded",
                 "joined", "said", "New", "York", "    ", "\n", "a",
                 # adversaries for the in/to cue PRE-FILTER: bare cue
                 # words without the full pattern, words merely ENDING
                 # in the cue letters, cue glued to the match (no space)
                 "to", "moved", "into", "auto", "Berlin", "Photo",
                 "offices", "located", "inBerlin", "XDr.", "Prof.",
                 "to\tOslo", "in\nRome"]
        for _ in range(3000):
            t = " ".join(rng.choices(words, k=rng.randint(3, 14)))
            for m in N._CAPSEQ_RE.finditer(t):
                assert (classify_full_prefix(t, m)
                        == N._classify_capseq(t, m)), (t, m.group(0))


class TestRelations:
    def test_founded(self):
        text = "Alice Johnson founded Acme Inc. in 2015."
        ents = [r["name"] for r in extract_entities(text)]
        quads = extract_quads(text, ents, datetime(2020, 1, 1))
        assert any(
            q["source"] == "Alice Johnson"
            and q["target"] == "Acme Inc"
            and q["relationship"] == "founded"
            and q["valid_from"] == datetime(2015, 1, 1)
            for q in quads
        )

    def test_acquired_iso_date(self):
        text = "Acme Inc. acquired Globex Corp. on 2019-05-12."
        ents = [r["name"] for r in extract_entities(text)]
        quads = extract_quads(text, ents, datetime(2020, 1, 1))
        q = next(q for q in quads if q["relationship"] == "acquired")
        assert q["valid_from"] == datetime(2019, 5, 12)

    def test_needs_two_entities(self):
        assert extract_quads("Acme Inc. grew.", ["Acme Inc"], datetime(2020, 1, 1)) == []

    def test_default_valid_from(self):
        text = "Acme Inc. partnered with Globex Corp."
        ents = [r["name"] for r in extract_entities(text)]
        quads = extract_quads(text, ents, datetime(2020, 6, 1))
        q = next(q for q in quads if q["relationship"] == "partnered with")
        assert q["valid_from"] == datetime(2020, 6, 1)

    def test_merge_duplicates(self):
        rows = [
            {"source": "A", "target": "B", "relationship": "Founded",
             "timestamp": None, "valid_from": datetime(2021, 1, 1),
             "description": "short", "confidence": 0.85,
             "source_chunks": ["c2"]},
            {"source": "A", "target": "B", "relationship": "founded",
             "timestamp": None, "valid_from": datetime(2020, 1, 1),
             "description": "a longer description", "confidence": 0.85,
             "source_chunks": ["c1"]},
        ]
        merged = merge_duplicate_relations(rows)
        assert len(merged) == 1
        m = merged[0]
        assert m["source_chunks"] == ["c1", "c2"]
        assert m["description"] == "a longer description"
        assert m["valid_from"] == datetime(2020, 1, 1)

    def test_merge_order_insensitive(self):
        rows = [
            {"source": "A", "target": "B", "relationship": "founded",
             "timestamp": None, "valid_from": datetime(2021, 1, 1),
             "description": f"desc {i}", "confidence": 0.85,
             "source_chunks": [f"c{i}"]}
            for i in range(4)
        ]
        a = merge_duplicate_relations(rows)
        b = merge_duplicate_relations(list(reversed(rows)))
        assert a == b


class TestHashing:
    def test_md5_matches_duckdb(self):
        import duckdb
        assert md5_hex("abc") == duckdb.sql("select md5('abc')").fetchone()[0]

    def test_stable_hash_deterministic(self):
        assert stable_hash64("x") == stable_hash64("x")
        assert stable_hash64("x", 1) != stable_hash64("x", 2)
        assert 0 <= stable_hash64("x") < 2 ** 63

    def test_shingles(self):
        assert word_shingles("a b c d", 3) == ["a b c", "b c d"]
        assert word_shingles("a", 3) == ["a"]

    def test_minhash_similarity(self):
        s1 = word_shingles("the quick brown fox jumps over the lazy dog " * 5)
        s2 = word_shingles("the quick brown fox jumps over the lazy cat " * 5)
        s3 = word_shingles("completely different text about other things " * 5)
        sig1, sig2, sig3 = (minhash_signature(s) for s in (s1, s2, s3))
        sim12 = (sig1 == sig2).mean()
        sim13 = (sig1 == sig3).mean()
        assert sim12 > sim13
        assert len(minhash_bands(sig1, 16)) == 16
        # identical docs share all bands
        assert minhash_bands(sig1, 16) == minhash_bands(minhash_signature(s1), 16)

    def test_simhash(self):
        a = simhash64(word_shingles("the quick brown fox jumps " * 10, 2))
        b = simhash64(word_shingles("the quick brown fox leaps " * 10, 2))
        c = simhash64(word_shingles("unrelated corpus of words entirely " * 10, 2))
        assert hamming64(a, b) < hamming64(a, c)

    def test_hamming64_vec_matches_scalar(self):
        import numpy as np

        from temporal_knowledge_graphs_ray.functions.hashing import hamming64_vec

        rng = np.random.default_rng(7)
        a = rng.integers(0, 2**63, 500, dtype=np.int64)
        b = rng.integers(0, 2**63, 500, dtype=np.int64)
        # include negative int64 (uint64-origin) and boundary values
        a[:4] = [-1, 0, np.iinfo(np.int64).min, np.iinfo(np.int64).max]
        b[:4] = [0, -1, -1, np.iinfo(np.int64).min]
        got = hamming64_vec(a, b)
        want = [hamming64(int(x) & (2**64 - 1), int(y) & (2**64 - 1))
                for x, y in zip(a, b)]
        assert got.tolist() == want
        assert hamming64_vec(np.empty(0, np.int64),
                             np.empty(0, np.int64)).tolist() == []

    def test_jaccard(self):
        assert jaccard({1, 2}, {2, 3}) == 1 / 3
        assert jaccard(set(), set()) == 1.0


class TestEmbed:
    def test_deterministic_and_normalized(self):
        v1 = embed_text("Acme Inc")
        v2 = embed_text("Acme Inc")
        assert (v1 == v2).all()
        assert abs(float((v1 ** 2).sum()) - 1.0) < 1e-5

    def test_similar_strings_close(self):
        a = embed_text("Massachusetts Institute of Technology")
        b = embed_text("Massachusets Institute of Technology")
        c = embed_text("zzzz qqqq completely other")
        assert cosine(a, b) > 0.9
        assert cosine(a, b) > cosine(a, c)


class TestTextStats:
    def test_langid(self):
        assert detect_language("the cat and the dog in the house") == "en"
        assert detect_language("der Hund und die Katze ist nicht da") == "de"
        assert detect_language("xyzzy plugh") == "unknown"

    def test_quality(self):
        q = quality_signals("Hello, world! The test.")
        assert q["n_chars"] == 23
        assert q["n_words"] == 4
        assert q["n_punct"] == 3
        assert 0 < q["punct_ratio"] < 1

    def test_fingerprint(self):
        assert fingerprint("  Hello   WORLD ") == fingerprint("hello world")
        assert fingerprint("a") != fingerprint("b")
