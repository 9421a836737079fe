"""Deterministic synthesis of Common-Crawl-style pages (FIXTURES.md F1/F5).

Schema per BASELINE.json input_hint:
    (url: string, warc_ts: timestamp[us], html: binary, text: large_string,
     lang: string)

Everything is a pure function of the row key (page index / doc_id) via
stable MD5 hashing — no wall clock, no RNG state — so pages can be
generated inside distributed ``map_batches`` tasks and regenerate
identically under Ray retries.

Planted content: sentences from closed templates over a synthetic entity
universe (people, orgs with alias/suffix variants, acronym orgs with full
names, locations, money, dates) mirroring the reference's 14-type NER
vocabulary and short relation labels. Hub entities appear in a large
fraction of pages to exercise skew handling. The ``text`` column holds the
expected HTML extraction (the byte-identical gate's ground truth): the HTML
is constructed so ``extract_text_from_html(html) == text`` exactly.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pyarrow as pa

from ..functions.hashing import fast_hash64

FIRST_NAMES = ["Alice", "Bob", "Carol", "David", "Emma", "Frank", "Grace",
               "Henry", "Irene", "Jack", "Karen", "Louis"]
LAST_NAMES = ["Johnson", "Smith", "White", "Brown", "Davis", "Miller",
              "Wilson", "Moore", "Taylor", "Anderson", "Thomas", "Harris"]
ORG_BASES = ["Acme", "Globex", "Initech", "Umbrella", "Stark", "Wayne",
             "Cyberdyne", "Tyrell", "Aperture", "Vandelay", "Hooli",
             "Soylent", "Wonka", "Oscorp", "Gringotts", "Duff"]
ORG_SUFFIXES = ["Inc.", "Corp.", "Corporation", "LLC", "Ltd.", "GmbH", "AG",
                "Company"]
CAMEL_ORGS = ["OpenAI", "DeepMind", "NeuralWorks", "DataBridge", "CloudNine"]
# (acronym, full name) pairs: cross-block duplicates resolved via alias dict
ACRONYM_ORGS = [
    ("MIT", "Massachusetts Institute of Technology"),
    ("IBM", "International Business Machines"),
    ("NASA", "National Aeronautics and Space Administration"),
]
# spacing variants: same org, two surfaces in the same blocking prefix
SPACING_VARIANTS = [("OpenAI", "Open AI"), ("DataBridge", "Data Bridge")]
LOCATIONS = ["Berlin", "London", "Paris", "Tokyo", "Austin", "Zurich",
             "Singapore", "Toronto", "Oslo", "Madrid"]
# hub entities: appear in ~1/3 of pages (head-entity skew)
HUB_ORGS = ["Acme Inc.", "OpenAI"]

_EPOCH = datetime(2019, 1, 1)
_SPAN_SECONDS = 5 * 365 * 24 * 3600  # 2019-01-01 .. ~2023-12-31

FILLER_LINES = [
    "Market conditions remained volatile throughout the period.",
    "Analysts expect continued growth across the sector.",
    "Shares traded higher after the announcement.",
    "Terms of the deal were not disclosed.",
    "A spokesperson declined to comment further.",
    "Research & development spending rose modestly.",  # exercises "&" entity
    "The filing is available on the investor relations page.",
]


def _h(key: str, page: int) -> int:
    # CRC-based: page synthesis calls this ~30x per page; MD5 would be a
    # third of the fixture generator's cost. Stable across processes.
    return fast_hash64(f"{key}|{page}")


def _person(page: int, salt: int) -> str:
    return (f"{FIRST_NAMES[_h('fn' + str(salt), page) % len(FIRST_NAMES)]} "
            f"{LAST_NAMES[_h('ln' + str(salt), page) % len(LAST_NAMES)]}")


def _org(page: int, salt: int) -> str:
    """Pick an org surface form; hubs, camel-case, acronyms, suffix variants."""
    r = _h("orgkind" + str(salt), page) % 100
    if r < 30:
        return HUB_ORGS[_h("hub" + str(salt), page) % len(HUB_ORGS)]
    if r < 45:
        camel = CAMEL_ORGS[_h("camel" + str(salt), page) % len(CAMEL_ORGS)]
        for canonical, spaced in SPACING_VARIANTS:
            if camel == canonical and _h("sp" + str(salt), page) % 3 == 0:
                return spaced
        return camel
    if r < 55:
        acro, full = ACRONYM_ORGS[_h("acro" + str(salt), page) % len(ACRONYM_ORGS)]
        return acro if _h("af" + str(salt), page) % 2 == 0 else full
    base = ORG_BASES[_h("base" + str(salt), page) % len(ORG_BASES)]
    if _h("suf?" + str(salt), page) % 4 == 0:
        return base  # bare base ("Acme") — suffix-stripped variant
    return f"{base} {ORG_SUFFIXES[_h('suf' + str(salt), page) % len(ORG_SUFFIXES)]}"


def warc_timestamp(page: int) -> datetime:
    return _EPOCH + timedelta(seconds=(_h("ts", page) * 9973) % _SPAN_SECONDS)


def _fact_sentences(page: int, n_facts: int) -> list[str]:
    """Planted relation sentences for one page (pure function of page id)."""
    out = []
    for i in range(n_facts):
        kind = _h(f"kind{i}", page) % 8
        year = 2010 + _h(f"year{i}", page) % 14
        if kind == 0:
            out.append(f"{_person(page, i)} founded {_org(page, i)} in {year}.")
        elif kind == 1:
            month = 1 + _h(f"mo{i}", page) % 12
            day = 1 + _h(f"day{i}", page) % 28
            out.append(f"{_org(page, i)} acquired {_org(page, i + 100)} on "
                       f"{year}-{month:02d}-{day:02d}.")
        elif kind == 2:
            loc = LOCATIONS[_h(f"loc{i}", page) % len(LOCATIONS)]
            out.append(f"{_org(page, i)} is headquartered in {loc}.")
        elif kind == 3:
            out.append(f"{_person(page, i)} is the CEO of {_org(page, i)}.")
        elif kind == 4:
            out.append(f"{_org(page, i)} partnered with {_org(page, i + 100)} "
                       f"in {year}.")
        elif kind == 5:
            millions = 1 + _h(f"m{i}", page) % 900
            frac = _h(f"f{i}", page) % 10
            quarter = 1 + _h(f"q{i}", page) % 4
            out.append(f"{_org(page, i)} reported revenue of "
                       f"${millions}.{frac} million in Q{quarter} {year}.")
        elif kind == 6:
            out.append(f"{_person(page, i)} joined {_org(page, i)} in {year}.")
        else:
            out.append(f"{_org(page, i)} invested in {_org(page, i + 100)} "
                       f"in {year}.")
    return out


def page_url(page: int, site_count: int = 50) -> str:
    return f"https://site{_h('site', page) % site_count}.example/page/{page}"


def make_page(page: int, extra_text: str = "", site_count: int = 50) -> dict:
    """One pages-table row. ``extra_text`` lines are woven into the body."""
    url = page_url(page, site_count)
    n_facts = 2 + _h("nfacts", page) % 4
    facts = _fact_sentences(page, n_facts)
    fillers = [FILLER_LINES[_h(f"fill{j}", page) % len(FILLER_LINES)]
               for j in range(2)]
    title = f"Report {page}: {_org(page, 999)}"

    extra_lines = [ln.strip() for ln in extra_text.splitlines() if ln.strip()]
    body_lines = [facts[0], fillers[0], *extra_lines, *facts[1:], fillers[1]]

    # text = exactly what extract_text_from_html must yield (title first)
    text = "\n".join([title, *body_lines])

    paragraphs = "\n".join(
        f"    <p>  {line}  </p>\n" for line in body_lines
    )
    # "&" must survive as an entity in HTML so decode is exercised
    html = (
        "<html><head><title>" + title.replace("&", "&amp;") + "</title>\n"
        "<style>body { font-family: serif; } p { margin: 0; }</style>\n"
        "<script>var t = 'tracking &amp; stuff';</script>\n"
        "</head>\n<body>\n  <div class=\"main\">\n\n"
        + paragraphs.replace("&", "&amp;") +
        "\n  </div>\n  <script>console.log(\"footer\");</script>\n"
        "</body></html>"
    )
    return {
        "url": url,
        "warc_ts": warc_timestamp(page),
        "html": html.encode("utf-8"),
        "text": text,
        "lang": ["en", "en", "en", "de", "fr"][_h("lang", page) % 5],
    }


PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.large_string()),
    ("lang", pa.string()),
])


def pages_table(page_ids: list[int], extra_texts: list[str] | None = None) -> pa.Table:
    rows = [
        make_page(p, extra_texts[i] if extra_texts else "")
        for i, p in enumerate(page_ids)
    ]
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def alias_table() -> pa.Table:
    """F5 alias dictionary: (alias, canonical, type).

    Covers the planted variants that surface-key blocking alone cannot unify
    (acronym <-> full name, spacing variants). Broadcast to linker actors via
    ``ray.put`` (north_star requirement).
    """
    rows = []
    for acro, full in ACRONYM_ORGS:
        rows.append({"alias": acro, "canonical": full, "type": "ORGANIZATION"})
    for canonical, spaced in SPACING_VARIANTS:
        rows.append({"alias": spaced, "canonical": canonical,
                     "type": "ORGANIZATION"})
    return pa.Table.from_pylist(rows, schema=pa.schema([
        ("alias", pa.string()), ("canonical", pa.string()),
        ("type", pa.string()),
    ]))


def synthesize_pages_dataset(num_pages: int, *, parallelism: int = 8):
    """Distributed page synthesis: ray.range -> map_batches(make_page).

    Generation happens inside tasks (numpy batch in, Arrow batch out), so
    the pages "source" streams like a real read and scales to any count.
    """
    import ray.data as rd

    def gen(batch: dict) -> pa.Table:
        ids = [int(x) for x in batch["id"]]
        return pages_table(ids)

    return (
        rd.range(num_pages, override_num_blocks=parallelism)
        .map_batches(gen, batch_format="numpy", batch_size=512)
    )


def pages_from_documents(sf_dir: str, repeat: int = 1):
    """Build the pages Dataset from a driver-provided documents.parquet.

    Each document row becomes one page whose body contains the document's
    text lines plus planted fact sentences keyed by doc_id — deterministic,
    so repeated runs and the sequential oracle see identical pages.

    ``repeat`` scales the corpus: replica k derives its pages from page id
    ``doc_id + k * 10_000_019`` (distinct ids -> distinct urls/facts), used
    by the scaling benchmark so compute dominates fixed startup cost.
    """
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    # TEST-SCALE SHIM: the documents table is tiny (KBs-MBs), so it is read
    # once on the driver and BROADCAST (ray.put), and page generation is
    # driven by rd.range — giving explicit block control so the downstream
    # fused chain parallelizes across the whole cluster. At production
    # scale the input is the pages Parquet itself (read_parquet with
    # natural 128 MiB blocks) and none of this applies.
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    doc_ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()
    docs_ref = ray.put((doc_ids, texts)) if ray.is_initialized() else None
    n_docs = len(doc_ids)

    def gen(batch: dict) -> pa.Table:
        if docs_ref is not None:
            ids_list, texts_list = ray.get(docs_ref)
        else:
            ids_list, texts_list = doc_ids, texts
        rows = []
        for x in batch["id"]:
            x = int(x)
            k, i = divmod(x, n_docs)
            rows.append(
                make_page(int(ids_list[i]) + k * 10_000_019, texts_list[i])
            )
        return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)

    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return (
        rd.range(n_docs * repeat, override_num_blocks=max(16, ncpu * 4))
        .map_batches(gen, batch_format="numpy", batch_size=256)
    )
