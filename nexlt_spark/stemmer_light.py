"""Per-language light stemmers + elision — the reference's non-English chains.

The reference indexes 35 analyzed language fields; the European ones it
actually serves (deu/fra/esp/las/ita/ptb/ptg …) use Solr "light
stemmer" chains (schema.xml:543-551 text_de, :612-622 text_fr,
:567-575 text_es, :707-717 text_it, :804-814 text_pt), all with the
StopFilter commented out — tokenize, lowercase, (elide), normalize,
light-stem. These stemmers descend from Savoy's published light
stemming approach (SAC 2006, "Light Stemming Approaches for the
French, Portuguese, German and Hungarian Languages"): strip only
plural/case/gender inflection with minimum-stem guards, never
derivational morphology.

The implementations here are original rule sets modeling those chains'
*retrieval behavior* (inflection groups collapse to one key; stems are
idempotent; index and query sides share the exact same function — the
only property BM25 rank identity needs). They are NOT char-for-char
transcriptions of the Lucene factories: the engine's correctness
contract is self-consistency of its own analyzer, which tests assert.

Each stemmer is a str→str token map, so the existing vocab-level
memoized pandas_udf path (analysis._lazy_spark: each distinct token
stemmed once per Arrow batch) applies unchanged — no new UDF shapes.
Elision is a stream-level no-op here because it runs at the *character*
stage: the apostrophe splits tokens at tokenization, so dropping the
article token is all that's left (handled by a token_map returning '').
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# German: GermanNormalizationFilter + GermanLightStemFilter analog
# (schema.xml:548-549)
# ---------------------------------------------------------------------------

_DE_ST_END = set("bdfghklmnt")  # consonants a final-s may follow ("st-ending")
_VOWELS = set("aeiouy")


def _de_normalize(w: str) -> str:
    """ß→ss; umlauts fold to base vowels; ae/oe/ue digraphs fold except
    'ue' after q or a vowel (quelle, neue keep their 'ue')."""
    w = w.replace("ß", "ss")
    out = []
    i = 0
    while i < len(w):
        c = w[i]
        nxt = w[i + 1] if i + 1 < len(w) else ""
        if c in "äöü":
            out.append({"ä": "a", "ö": "o", "ü": "u"}[c])
        elif c in "ao" and nxt == "e":
            out.append(c)
            i += 1
        elif c == "u" and nxt == "e" and not (out and (out[-1] in _VOWELS or out[-1] == "q")):
            out.append("u")
            i += 1
        else:
            out.append(c)
        i += 1
    return "".join(out)


def german_light_stem(w: str) -> str:
    w = _de_normalize(w)
    # pass 1: plural/case endings
    if len(w) > 6 and w.endswith("ern"):
        w = w[:-3]
    elif len(w) > 5 and w[-2:] in ("em", "en", "er", "es"):
        w = w[:-2]
    elif len(w) > 4 and w.endswith("e"):
        w = w[:-1]
    elif len(w) > 4 and w.endswith("s") and w[-2] in _DE_ST_END:
        w = w[:-1]
    # pass 2: a second layer of the same morphology (kindes→kind→kind,
    # größten→grossten→grosst→gross)
    if len(w) > 6 and w.endswith("est"):
        w = w[:-3]
    elif len(w) > 5 and (w.endswith("er") or w.endswith("en")):
        w = w[:-2]
    elif len(w) > 5 and w.endswith("st") and w[-3] in _DE_ST_END:
        w = w[:-2]
    return w


# ---------------------------------------------------------------------------
# French: ElisionFilter + FrenchLightStemFilter analog (schema.xml:616-619)
# ---------------------------------------------------------------------------

# lang/contractions_fr.txt — the article tokens the tokenizer has already
# split off at the apostrophe; drop them entirely (Lucene removes the
# article+apostrophe prefix, leaving the noun as its own token).
FR_ELISION = frozenset(
    ["l", "m", "t", "qu", "n", "s", "j", "d", "c", "jusqu", "quoiqu", "lorsqu", "puisqu"]
)
IT_ELISION = frozenset(
    # lang/contractions_it.txt articles (schema.xml:711)
    ["c", "l", "all", "dall", "dell", "nell", "sull", "coll", "pell", "gl",
     "agl", "dagl", "degl", "negl", "sugl", "un", "m", "t", "s", "v", "d"]
)

_FR_ACCENT = str.maketrans("àâäéèêëîïôöùûüç", "aaaeeeeiioouuuc")


def french_light_stem(w: str) -> str:
    w = w.translate(_FR_ACCENT)
    if len(w) > 4 and w.endswith("aux"):
        return w[:-3] + "al"  # chevaux → cheval
    if len(w) > 4 and w[-1] in "xs":
        w = w[:-1]  # plural -s / -x
    if len(w) > 5 and w.endswith("issement"):
        return w[:-6]  # établissement → établ-
    while len(w) > 4 and w[-1] == "e":
        w = w[:-1]  # feminine/mute -e, incl. -ée after accent folding
    if len(w) > 4 and w[-1] == w[-2] and w[-1] not in _VOWELS:
        w = w[:-1]  # collapse trailing doubled consonant (lettr→letr)
    return w


# ---------------------------------------------------------------------------
# Spanish: SpanishLightStemFilter analog (schema.xml:572)
# ---------------------------------------------------------------------------

_ES_ACCENT = str.maketrans("áéíóúü", "aeiouu")


def spanish_light_stem(w: str) -> str:
    w = w.translate(_ES_ACCENT)
    if len(w) < 5:
        return w
    if w[-1] in "oae":  # gender/theme vowel: gato/gata → gat
        return w[:-1]
    if w[-1] == "s":
        if w.endswith("ces"):  # luces → luz
            return w[:-3] + "z"
        if len(w) > 5 and w[-2] in "oae":  # gatos/gatas/clases → gat/clas
            return w[:-2]
    return w


# ---------------------------------------------------------------------------
# Portuguese: PortugueseLightStemFilter analog (schema.xml:809)
# ---------------------------------------------------------------------------

_PT_ACCENT = str.maketrans("áâãàéêíóôõúüç", "aaaaeeiooouuc")


def portuguese_light_stem(w: str) -> str:
    if len(w) < 4:
        return w.translate(_PT_ACCENT)
    # irregular plural classes BEFORE accent folding (ão/õe are distinct)
    if w.endswith("ões") or w.endswith("ães"):
        w = w[:-3] + "ão"  # nações → nação, pães → pão
    w = w.translate(_PT_ACCENT)
    if len(w) < 5:
        return w
    if w.endswith("is"):
        w = w[:-2] + "l"  # animais → animal, papéis → papel
    elif w.endswith("ns"):
        w = w[:-2] + "m"  # bens → bem
    elif w.endswith("res") or w.endswith("zes") or w.endswith("ses"):
        w = w[:-2]  # flores → flor, vezes → vez
    elif w[-1] == "s" and w[-2] in "oae":
        w = w[:-2]  # gatos → gat… then gender vowel below
    if len(w) > 4 and w[-1] in "oae":
        w = w[:-1]  # gender/theme vowel
    return w


# ---------------------------------------------------------------------------
# Italian: ElisionFilter + ItalianLightStemFilter analog (schema.xml:711-714)
# ---------------------------------------------------------------------------

_IT_ACCENT = str.maketrans("àèéìíòóùú", "aeeiioouu")


def italian_light_stem(w: str) -> str:
    w = w.translate(_IT_ACCENT)
    if len(w) < 6:
        return w
    # plural → singular vowel classes, then strip the theme vowel:
    # gatti→gatt, gatte→gatt, amico/amici→amic, stazione/stazioni→stazion
    # strip the plural/theme vowel: gatti/gatte→gatt, amico/amici→amic,
    # stazione/stazioni→stazion (doubled consonants kept — both sides
    # of the match strip identically, which is all ranking needs)
    if w[-1] in "ieoa":
        w = w[:-1]
    return w


# ---------------------------------------------------------------------------
# Arabic: ArabicNormalizationFilter + ArabicStemFilter analog
# (schema.xml:466-476; the Lucene stemmer implements Larkey/Ballesteros/
# Connell's published "light10" approach — normalization + one layer of
# definite-article prefixes and plural/feminine suffixes, never roots)
# ---------------------------------------------------------------------------

# tashkeel (harakat) diacritics + tatweel, removed wholesale
_AR_DIACRITICS = dict.fromkeys(map(ord, "ًٌٍَُِّْـ"))
_AR_FOLD = str.maketrans(
    {
        "آ": "ا",  # alef madda  آ → ا
        "أ": "ا",  # alef hamza above أ → ا
        "إ": "ا",  # alef hamza below إ → ا
        "ٱ": "ا",  # alef wasla  ٱ → ا
        "ى": "ي",  # alef maksura ى → ي
        "ة": "ه",  # teh marbuta  ة → ه
    }
)

# light10 prefix set (longest first); strip at most one, and only when a
# stem of ≥2 chars remains
_AR_PREFIXES = ("وال", "بال", "كال",
                "فال", "ال", "لل", "و")
# light10 suffix set, checked repeatedly longest-first while ≥2 chars remain
_AR_SUFFIXES = ("ها", "ان", "ات", "ون",
                "ين", "يه", "ية", "ه",
                "ة", "ي")


def arabic_normalize(w: str) -> str:
    """Diacritic/tatweel removal + letter folding (the
    ArabicNormalizationFilter step — "normalizes ﻯ to ﻱ, etc")."""
    return w.translate(_AR_DIACRITICS).translate(_AR_FOLD)


def arabic_light_stem(w: str) -> str:
    w = arabic_normalize(w)
    for p in _AR_PREFIXES:
        if w.startswith(p) and len(w) - len(p) >= 2:
            w = w[len(p):]
            break
    changed = True
    while changed:
        changed = False
        for s in _AR_SUFFIXES:
            if w.endswith(s) and len(w) - len(s) >= 2:
                w = w[: -len(s)]
                changed = True
                break
    return w


# ---------------------------------------------------------------------------
# Russian: light-stem analog of the text_ru chain (schema.xml:827-837 —
# the reference ships SnowballPorter(Russian) with RussianLightStemFilter
# noted as the less-aggressive alternative; we model the light variant:
# one layer of noun/adjective number+case inflection with minimum-stem
# guards, which is the collapse retrieval ranking depends on)
# ---------------------------------------------------------------------------

# inflection endings, longest first: adjective (-ыми/-ого/-ему/…), then
# noun plural/case (-ами/-ях/-ов/…), then single theme vowels
_RU_ENDINGS = (
    "ыми", "ими", "ами", "ями",  # ыми ими ами ями
    "ого", "его", "ому", "ему",  # ого его ому ему
    "ых", "их", "ах", "ях",  # ых их ах ях
    "ый", "ий", "ой", "ей",  # ый ий ой ей
    "ая", "яя", "ое", "ее",  # ая яя ое ее
    "ые", "ие", "ов", "ев",  # ые ие ов ев
    "ам", "ям", "ом", "ем", "ия",  # ам ям ом ем ия
    "а", "я", "ы", "и", "о", "е", "у", "ю", "й", "ь",  # а я ы и о е у ю й ь
)


def russian_light_stem(w: str) -> str:
    w = w.replace("ё", "е")  # ё → е (standard Russian folding)
    for s in _RU_ENDINGS:
        if w.endswith(s) and len(w) - len(s) >= 3:
            w = w[: -len(s)]
            break
    # collapse residual soft/plural glide left by two-char endings (книгы→книг)
    if len(w) > 3 and w[-1] in "йь":
        w = w[:-1]
    return w
