"""Seeded deterministic synthetic Common-Crawl-style pages (FIXTURES.md F1).

Every row is a pure function of ``(seed, row_index)`` — `random.Random`
seeded with a string uses SHA-512 seeding, so generation is identical
across processes, hosts and Ray workers. No wall-clock, no external
data.

Schema (BASELINE.json ``input_hint``):
    url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string

Scenario mix (mirrors the reference's five manual fixture classes,
/root/reference/test/: general text, table, handwriting/noisy, multilingual,
Q&A — see SURVEY.md §5): ~70% plain article, ~10% table-heavy, ~10%
list/Q&A, ~5% multilingual, ~5% adversarial skew (giant DOMs 100–500 KB
and near-empty pages).

``text`` is the page's full visible text (boilerplate included) for
oracle cross-checks; the extraction target is the main-content subset.
"""

from __future__ import annotations

import datetime as _dt
import random

import pyarrow as pa

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

_EPOCH = _dt.datetime(2025, 1, 1)
_LANGS = ["en", "zh", "de", "fr", "es"]

_WORDS = {
    "en": (
        "the quick brown fox jumps over lazy dog time year people way day man "
        "thing world life hand part child eye woman place work week case point "
        "government company number group problem fact water market story result "
        "morning research question school state family student country history "
        "moment light power business night service area table paper energy"
    ).split(),
    "zh": list("我们的是在有一个人这中大为上国时要以可出会对生能自着子们于下之年过发后作里用道行所然家种事成方多经法"),
    "de": (
        "der die das und ist nicht ein eine zeit jahr mensch weg tag mann ding "
        "welt leben hand teil kind auge frau ort arbeit woche fall punkt staat "
        "firma nummer gruppe problem wasser markt geschichte ergebnis morgen "
        "frage schule familie land licht kraft nacht dienst bereich papier"
    ).split(),
    "fr": (
        "le la les et est pas un une temps année personne façon jour homme chose "
        "monde vie main partie enfant œil femme lieu travail semaine cas point "
        "état société nombre groupe problème eau marché histoire résultat matin "
        "question école famille pays lumière pouvoir nuit service zone papier"
    ).split(),
    "es": (
        "el la los y es no un una tiempo año persona manera día hombre cosa "
        "mundo vida mano parte niño ojo mujer lugar trabajo semana caso punto "
        "estado empresa número grupo problema agua mercado historia resultado "
        "mañana pregunta escuela familia país luz poder noche servicio zona"
    ).split(),
}
_CATEGORIES = ["news", "blog", "docs", "forum", "shop", "wiki"]
_NAV_WORDS = "home about contact products news archive login search help terms".split()


def _sentence(rng: random.Random, words: list[str], lo: int = 6, hi: int = 14) -> str:
    n = rng.randint(lo, hi)
    ws = [words[rng.randrange(len(words))] for _ in range(n)]
    s = " ".join(ws)
    return s[0].upper() + s[1:] + "."


def _paragraph(rng: random.Random, words: list[str], lo: int = 2, hi: int = 6) -> str:
    return " ".join(_sentence(rng, words) for _ in range(rng.randint(lo, hi)))


def _link_list(rng: random.Random, n: int) -> tuple[str, list[str]]:
    """n anchor items → (html, visible texts)."""
    items, texts = [], []
    for _ in range(n):
        w = _NAV_WORDS[rng.randrange(len(_NAV_WORDS))]
        w2 = _NAV_WORDS[rng.randrange(len(_NAV_WORDS))]
        t = f"{w} {w2}"
        items.append(f'<li><a href="/{w}/{w2}">{t}</a></li>')
        texts.append(t)
    return "<ul>" + "".join(items) + "</ul>", texts


def scenario_for(i: int) -> str:
    """Deterministic scenario by row index: 70/10/10/5/5 mix per 100 rows."""
    m = i % 100
    if m < 70:
        return "article"
    if m < 80:
        return "table"
    if m < 90:
        return "qa"
    if m < 95:
        return "multilingual"
    return "giant" if i % 2 == 0 else "empty"


def gen_page(i: int, seed: int = 42) -> dict:
    rng = random.Random(f"pages:{seed}:{i}")
    lang = _LANGS[i % len(_LANGS)]
    words = _WORDS[lang]
    category = _CATEGORIES[i % len(_CATEGORIES)]
    url = f"https://site{i % 97}.example/{category}/{i}"
    ts = _EPOCH + _dt.timedelta(seconds=i * 1337)
    scenario = scenario_for(i)

    visible: list[str] = []  # full visible text, block per entry
    body: list[str] = []

    # --- boilerplate chrome (high link density) ---
    nav_html, nav_texts = _link_list(rng, rng.randint(4, 8))
    body.append(f"<header><h1>Site {i % 97}</h1>{nav_html}</header>")
    visible.append(f"Site {i % 97}")
    visible.extend(nav_texts)
    nav2_html, nav2_texts = _link_list(rng, rng.randint(3, 6))
    body.append(f"<nav>{nav2_html}</nav>")
    visible.extend(nav2_texts)

    # --- main content ---
    main: list[str] = []
    title = _sentence(rng, words, 3, 7)
    main.append(f"<h2>{title}</h2>")
    visible.append(title)

    if scenario == "empty":
        if rng.random() < 0.4:
            # truly empty payload → in-band `empty_payload` error row
            # (reference M1 invalid-payload semantics, QwenAdapter.cpp:503)
            return {
                "url": url,
                "warc_ts": ts,
                "html": b"",
                "text": "",
                "lang": lang,
            }
        # else: near-empty page — chrome only, title-only content
    elif scenario == "article" or scenario == "giant":
        if scenario == "article":
            n_par = rng.randint(3, 8)
        else:
            n_par = rng.randint(300, 900)  # giant DOM: ~100–500 KB html
        for _ in range(n_par):
            p = _paragraph(rng, words, 4, 10) if scenario == "giant" else _paragraph(rng, words)
            # occasional inline link inside a paragraph (kept content)
            if rng.random() < 0.2:
                w = words[rng.randrange(len(words))]
                p += f' See <a href="/ref/{w}">{w}</a> for details.'
                main.append(f"<p>{p}</p>")
                visible.append(_collapse(p))
            else:
                main.append(f"<p>{p}</p>")
                visible.append(p)
    elif scenario == "table":
        for _ in range(rng.randint(1, 3)):
            p = _paragraph(rng, words, 1, 3)
            main.append(f"<p>{p}</p>")
            visible.append(p)
        rows = rng.randint(3, 8)
        cols = rng.randint(2, 4)
        trs = []
        hdr = [words[rng.randrange(len(words))] for _ in range(cols)]
        trs.append("<tr>" + "".join(f"<th>{h}</th>" for h in hdr) + "</tr>")
        visible.extend(hdr)
        for r in range(rows):
            cells = [
                f"{words[rng.randrange(len(words))]} {rng.randint(0, 9999)}"
                for _ in range(cols)
            ]
            trs.append("<tr>" + "".join(f"<td>{c}</td>" for c in cells) + "</tr>")
            visible.extend(cells)
        main.append("<table>" + "".join(trs) + "</table>")
    elif scenario == "qa":
        for _ in range(rng.randint(2, 5)):
            q = _sentence(rng, words, 4, 9)
            a = _paragraph(rng, words, 1, 3)
            main.append(f"<h3>Q: {q}</h3><p>A: {a}</p>")
            visible.append(f"Q: {q}")
            visible.append(f"A: {a}")
        items = [_sentence(rng, words, 3, 6) for _ in range(rng.randint(3, 6))]
        main.append("<ul>" + "".join(f"<li>{x}</li>" for x in items) + "</ul>")
        visible.extend(items)
    elif scenario == "multilingual":
        for other in _LANGS:
            p = _paragraph(rng, _WORDS[other], 1, 3)
            main.append(f"<p>{p}</p>")
            visible.append(p)

    body.append("<main><article>" + "".join(main) + "</article></main>")

    side_html, side_texts = _link_list(rng, rng.randint(4, 10))
    body.append(f"<aside><h3>Related</h3>{side_html}</aside>")
    visible.append("Related")
    visible.extend(side_texts)
    foot_html, foot_texts = _link_list(rng, rng.randint(2, 5))
    body.append(f"<footer>{foot_html}<p>© 2025 site{i % 97}</p></footer>")
    visible.extend(foot_texts)
    visible.append(f"© 2025 site{i % 97}")

    html_doc = (
        "<!DOCTYPE html><html><head>"
        f"<title>{title}</title>"
        "<style>body{margin:0}</style>"
        "<script>var x=1;</script>"
        f'</head><body>{"".join(body)}</body></html>'
    )
    return {
        "url": url,
        "warc_ts": ts,
        "html": html_doc.encode("utf-8"),
        "text": "\n".join(_collapse(v) for v in visible if v.strip()),
        "lang": lang,
    }


def _collapse(s: str) -> str:
    return " ".join(s.split())


def pages_table(indices, seed: int = 42) -> pa.Table:
    """Build a pyarrow Table of pages for the given row indices."""
    rows = [gen_page(int(i), seed) for i in indices]
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def pages_batch_fn(seed: int = 42):
    """map_batches kernel: ray.data.range(n) id batch → pages batch."""

    def fn(batch: pa.Table) -> pa.Table:
        return pages_table(batch["id"].to_pylist(), seed)

    return fn


def write_pages_dataset(
    out_dir: str, n_rows: int, seed: int = 42, num_shards: int | None = None
) -> None:
    """Generate ``n_rows`` pages in parallel with Ray and write parquet.

    Deterministic in content (each row derives from its index only);
    file layout may vary with parallelism, which downstream code never
    depends on.
    """
    import ray.data as rd

    if num_shards is None:
        # enough shards that #work-items ≥ 2× a 32-CPU node's pool even
        # at bench scale (ray_guide: row_groups ≥ 2× cluster CPUs);
        # ~2.5k rows (~15–40 MB) per shard
        num_shards = max(8, n_rows // 2_500)
    rows_per_shard = -(-n_rows // num_shards)
    ds = rd.range(n_rows, override_num_blocks=num_shards)
    ds = ds.map_batches(pages_batch_fn(seed), batch_format="pyarrow", batch_size=1024)
    ds.write_parquet(
        out_dir,
        min_rows_per_file=rows_per_shard,
        max_rows_per_file=rows_per_shard,
    )


def sf_to_n_rows(sf: float) -> int:
    """FIXTURES.md sizing: tiny=200 (sf0.001-ish unit scale), small=5k
    (sf0.01 correctness), bench=200k (sf0.1)."""
    if sf <= 0.001:
        return 200
    if sf <= 0.01:
        return 5_000
    return 200_000
