"""Batch-2 per-language light chains (stemmer_light2 module).

Same contract as tests/test_light_stemmers.py and test_intl_chains.py:
inflection groups collapse to one key, stems are idempotent, unrelated
words stay apart, the chain equals the token-mapped standard chain, and
BM25 ranks match the pure-Python oracle end-to-end. Parity with the
Lucene factories (several Snowball/dictionary-backed) is explicitly NOT
claimed — see the stemmer_light2 module docstring.
"""

import pytest

from nexlt_spark.analysis import ANALYZERS, tokenize
from nexlt_spark.stemmer_light2 import (
    armenian_light_stem,
    basque_light_stem,
    bulgarian_light_stem,
    galician_light_stem,
    irish_light_stem,
    latvian_light_stem,
    catalan_light_stem,
    czech_light_stem,
    danish_light_stem,
    dutch_light_stem,
    finnish_light_stem,
    greek_light_stem,
    hindi_light_stem,
    hungarian_light_stem,
    indonesian_light_stem,
    norwegian_light_stem,
    persian_normalize,
    polish_light_stem,
    romanian_light_stem,
    swedish_light_stem,
    turkish_light_stem,
)

# (stem fn, [inflection groups that must share a key], (two unrelated
# words that must NOT share a key))
CASES = {
    "nl": (
        dutch_light_stem,
        [
            ["boek", "boeken"],
            ["huis", "huizen"],  # z→s spelling repair
            ["brief", "brieven"],  # v→f spelling repair
            ["tafel", "tafels"],
            ["mogelijkheid", "mogelijkheden"],  # -heden → -heid
            ["kat", "katten"],  # undouble
        ],
        ("boek", "huis"),
    ),
    "sv": (
        swedish_light_stem,
        [
            ["bok", "boken", "bokens"],
            ["flicka", "flickan", "flickor", "flickorna"],
            ["hus", "huset", "husen"],
            ["stor", "stora"],
        ],
        ("bok", "hus"),
    ),
    "no": (
        norwegian_light_stem,
        [
            ["bok", "boken", "bokene"],
            ["hus", "huset", "husene"],
            ["mulighet", "muligheten", "muligheter"],
        ],
        ("bok", "hus"),
    ),
    "da": (
        danish_light_stem,
        [
            ["bog", "bogen", "bogens"],
            ["hus", "huset", "husene"],
            ["oversættelse", "oversættelsen", "oversættelser"],
        ],
        ("bog", "hus"),
    ),
    "fi": (
        finnish_light_stem,
        [
            # nominative/inessive/elative/illative/plural/genitive
            ["talo", "talossa", "talosta", "taloon", "talot", "talon"],
            ["kissa", "kissan", "kissat", "kissaa"],
        ],
        ("talo", "kissa"),
    ),
    "hu": (
        hungarian_light_stem,
        [
            ["ház", "házak", "házban", "házat"],
            ["könyv", "könyvek", "könyvet", "könyvben"],
        ],
        ("ház", "könyv"),
    ),
    "cz": (
        czech_light_stem,
        [
            ["kniha", "knihy", "knihu", "knize"],  # h↔z palatalization
            ["matka", "matky", "matce"],  # k↔c palatalization
            ["překlad", "překladu", "překlady"],
        ],
        ("kniha", "matka"),
    ),
    "bg": (
        bulgarian_light_stem,
        [
            ["книга", "книгата", "книги", "книгите"],  # postposed article
            ["град", "градът", "градове", "градовете"],
        ],
        ("книга", "град"),
    ),
    "ro": (
        romanian_light_stem,
        [
            ["carte", "cartea", "cărți", "cărțile"],  # comma-below fold
            ["traducere", "traducerea", "traduceri"],
        ],
        ("carte", "traducere"),
    ),
    "ca": (
        catalan_light_stem,
        [
            ["casa", "cases"],
            ["traducció", "traduccions"],  # accent fold + plural
            ["llibre", "llibres"],
        ],
        ("casa", "llibre"),
    ),
    "el": (
        greek_light_stem,
        [
            ["βιβλίο", "βιβλία", "βιβλίου"],  # tonos fold + case layer
            ["μετάφραση", "μεταφράσεις", "μετάφρασης"],  # final-ς fold
        ],
        ("βιβλίο", "μετάφραση"),
    ),
    "tr": (
        turkish_light_stem,
        [
            # plural/accusative/possessive/ablative + b→p de-voicing
            ["kitap", "kitaplar", "kitabı", "kitapları", "kitaptan"],
            ["ev", "evler", "evi", "evde"],
        ],
        ("kitap", "ev"),
    ),
    "fa": (
        persian_normalize,
        [["كتاب", "کتاب"]],  # arabic kaf ↔ farsi keheh
        ("کتاب", "قلم"),
    ),
    "hi": (
        hindi_light_stem,
        [
            # precomposed vs decomposed nukta + oblique/plural matras
            ["लड़का", "लडका", "लड़के", "लड़कों"],
            ["किताब", "किताबें", "किताबों"],
        ],
        ("लडका", "किताब"),
    ),
    "id": (
        indonesian_light_stem,
        [
            # meN-/di- prefixes and -an suffix join the bare root
            ["ajar", "mengajar", "diajar", "ajaran"],
            ["baca", "membaca", "dibaca", "bacaan"],
        ],
        ("ajar", "baca"),
    ),
    # batch 3
    "eu": (
        basque_light_stem,
        [
            # absolutive sg/pl, inessive, ablative
            ["etxe", "etxea", "etxeak", "etxean", "etxetik", "etxeetan"],
            ["liburu", "liburua", "liburuak", "liburutik"],
        ],
        ("etxea", "liburua"),
    ),
    "ga": (
        irish_light_stem,
        [
            # eclipsis (gc-), lenition (ch-), plural -anna
            ["carr", "gcarr", "charr", "carranna"],
            ["fadhb", "bhfadhb", "fadhbanna"],
            ["bord", "mbord", "bhord"],
            ["scoil", "scoileanna"],
        ],
        ("carr", "bord"),
    ),
    "gl": (
        galician_light_stem,
        [
            ["libro", "libros"],
            ["canción", "cancións"],  # accent fold + -ns plural
            ["tradución", "traducións"],
        ],
        ("libro", "canción"),
    ),
    "hy": (
        armenian_light_stem,
        [
            # article, plural -ner with genitive, instrumental
            ["համակարգիչ", "համակարգիչը", "համակարգիչներ",
             "համակարգիչների", "համակարգիչով"],
            ["լեզու", "լեզուն", "լեզուների"],
        ],
        ("համակարգիչ", "լեզու"),
    ),
    "pl": (
        polish_light_stem,
        [
            # noun case/number; soft-stem noun; adjective; -ość abstract
            ["książka", "książki", "książkę", "książkach", "książkami",
             "książkom"],
            ["tłumaczenie", "tłumaczenia", "tłumaczeniu", "tłumaczeniem",
             "tłumaczeniach"],
            ["nowy", "nowa", "nowe", "nowego", "nowemu", "nowych",
             "nowymi", "nowym"],
            ["wartość", "wartości"],
        ],
        ("książka", "tłumaczenie"),
    ),
    "lv": (
        latvian_light_stem,
        [
            # nom/gen/acc/dat; macrons kept (phonemic)
            ["grāmata", "grāmatas", "grāmatu", "grāmatai"],
            ["valoda", "valodas", "valodu"],
            ["ceļš", "ceļa", "ceļu"],
        ],
        ("grāmata", "valoda"),
    ),
}

CHAIN_OF = {
    "nl": "nl_light", "sv": "sv_light", "no": "no_light", "da": "da_light",
    "fi": "fi_light", "hu": "hu_light", "cz": "cz_light", "bg": "bg_light",
    "ro": "ro_light", "ca": "ca_light", "el": "el_light", "tr": "tr_light",
    "fa": "fa_norm", "hi": "hi_light", "id": "id_light",
    "eu": "eu_light", "ga": "ga_light", "gl": "gl_light",
    "hy": "hy_light", "lv": "lv_light", "pl": "pl_light",
}


@pytest.mark.parametrize("lang", sorted(CASES), ids=str)
def test_groups_collapse(lang):
    fn, groups, _ = CASES[lang]
    for group in groups:
        stems = {fn(w) for w in group}
        assert len(stems) == 1, f"{lang}: {group} -> {stems}"


@pytest.mark.parametrize("lang", sorted(CASES), ids=str)
def test_idempotent(lang):
    fn, groups, _ = CASES[lang]
    for group in groups:
        for w in group:
            s = fn(w)
            assert fn(s) == s, f"{lang}: {w} -> {s} -> {fn(s)}"


@pytest.mark.parametrize("lang", sorted(CASES), ids=str)
def test_unrelated_stay_apart(lang):
    fn, _, (a, b) = CASES[lang]
    assert fn(a) != fn(b)


def test_registry_complete():
    for chain in CHAIN_OF.values():
        assert chain in ANALYZERS
    # all batch-2 chains are vocab-level token maps (the memoized
    # pandas_udf fast path) — no new stream shapes beyond _drop_empty
    for chain in CHAIN_OF.values():
        assert ANALYZERS[chain].token_map is not None


@pytest.mark.parametrize(
    "lang,text",
    [
        ("sv", "Nya översättningar av boken"),
        ("tr", "kitapları ve evler hakkında"),
        ("el", "νέες μεταφράσεις βιβλίων"),
    ],
    ids=lambda v: v if len(str(v)) < 4 else "text",
)
def test_chain_equals_mapped_standard_chain(lang, text):
    fn, _, _ = CASES[lang]
    assert tokenize(text, CHAIN_OF[lang]) == [fn(t) for t in tokenize(text)]


def test_catalan_elision_drops_articles():
    # tokenizer splits «l'home» at the apostrophe; the elided article
    # maps to '' and _drop_empty removes it — same shape as fr/it
    assert tokenize("l'home d'aigua", "ca_light") == [
        catalan_light_stem("home"),
        catalan_light_stem("aigua"),
    ]


def test_irish_elision_drops_contractions():
    # lang/contractions_ga.txt is exactly {d, m, b}
    assert tokenize("d'athair m'anam", "ga_light") == [
        irish_light_stem("athair"),
        irish_light_stem("anam"),
    ]


def test_std_aliases_equal_standard_chain():
    # text_he/sk/vi declare Standard+LowerCase with the stemmer commented
    # out in the reference — the named chains must behave exactly like
    # "standard"
    text = "Xin chào thế giới 123"
    for chain in ("he_std", "sk_std", "vi_std"):
        spec = ANALYZERS[chain]
        assert spec.token_map is None and spec.stream_map is None
        assert tokenize(text, chain) == tokenize(text)


@pytest.fixture(scope="module")
def batch2_corpus(spark):
    rows = [
        (0, "nya översättningar av boken är klara"),
        (1, "en bok om historia"),
        (2, "något helt annat ämne"),
        (3, "kitapları okudum ve evde bıraktım"),
        (4, "bu kitap çok güzel"),
        (5, "alakasız bir konu"),
        (6, "οι νέες μεταφράσεις του βιβλίου"),
        (7, "ένα βιβλίο για την ιστορία"),
        (8, "κάτι εντελώς άσχετο"),
        (9, "nowe tłumaczenia książki gotowe"),
        (10, "tłumaczenie starej książki"),
        (11, "zupełnie inny temat"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize(
    "analyzer,query,want_docs",
    [
        ("sv_light", ["bokens"], {0, 1}),       # genitive reaches both books
        ("tr_light", ["kitaplardan"], {3, 4}),  # plural-ablative reaches both
        ("el_light", ["βιβλία"], {6, 7}),       # plural reaches both
        ("pl_light", ["książkami"], {9, 10}),   # instrumental plural reaches both
    ],
)
def test_batch2_end_to_end_rank_identity(batch2_corpus, analyzer, query, want_docs):
    """Index with the chain; an inflected query reaches docs containing
    only other surface forms, and engine ranks == pure-Python oracle."""
    from nexlt_spark.index.build import build_index
    from nexlt_spark.oracle import OracleIndex
    from nexlt_spark.query.exact import bm25_topk
    from nexlt_spark.query.model import Query

    idx = build_index(batch2_corpus, analyzer=analyzer).persist()
    got = [
        (r["doc_id"], round(r["score"], 9))
        for r in bm25_topk(idx, batch2_corpus, Query(terms=query, k=10))
        .select("doc_id", "score")
        .collect()
    ]
    assert {d for d, _ in got} == want_docs
    rows = [r.asDict() for r in batch2_corpus.collect()]
    oracle = OracleIndex(rows, analyzer=analyzer)
    want = [(d, round(s, 9)) for d, s in oracle.topk(Query(terms=query, k=10))]
    assert got == want
