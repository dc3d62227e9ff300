"""Batch-2 per-language light chains — the rest of the reference's
dictionary-free analyzed languages.

The reference's schema declares 43 text fieldTypes; round 2 shipped the
eight highest-traffic chains and round 3 added ja/ar/ru
(``stemmer_light``).  This module models the remaining *dictionary-free*
chains (solr/NeXLT/solr/collection1/conf/schema.xml): Dutch
(text_nl :781-789), Swedish (text_sv :848-856), Norwegian
(text_no :792-802), Danish (text_da :533-541), Finnish (text_fi
:601-610), Hungarian (text_hu :675-683), Czech (text_cz :523-531),
Bulgarian (text_bg :479-487), Romanian (text_ro :817-826), Catalan
(text_ca :489-498, with elision), Greek (text_el :556-565), Turkish
(text_tr :870-878), Persian (text_fa :588-598, normalization only),
Hindi (text_hi :651-662), Indonesian (text_id :696-704); batch 3
completes the set: Basque (text_eu :578-587), Irish (text_ga :626-639,
with elision + mutation folding), Galician (text_gl :640-650), Armenian
(text_hy :686-695) and Latvian (text_lv :771-780).  Hebrew/Slovak/
Vietnamese (text_he :665-673, text_sk :838-847, text_vi :880-888)
declare Standard+LowerCase with the stemmer commented OUT in the
reference, so they alias the ``standard`` chain.  Polish (text_pl,
Stempel statistical dictionary) and Thai (text_th, ICU dictionary
word-break) are dictionary-backed; they ship as honestly-labeled
approximations — ``polish_light_stem`` below and analysis.py's
``th_bigram`` — with parity explicitly not claimed, like ja_seg.

Same contract as ``stemmer_light`` (its module docstring): these are
ORIGINAL conservative rule sets modeling each chain's *retrieval
behavior* — inflection groups collapse to one key, stems are idempotent,
the identical function runs on index and query side (the only property
BM25 rank identity needs).  They are NOT transcriptions of the Lucene
factories (several of which are Snowball- or dictionary-backed); where
the reference uses a heavier stemmer (Snowball Dutch/Swedish/…), the
light variant here is the one Lucene itself documents as the
"less aggressive" alternative in the same fieldType comment.

Every function is a str→str token map, so the vocab-level memoized
pandas_udf path applies unchanged — no new UDF shapes, no per-row
Python.
"""

from __future__ import annotations


def _strip_one(w: str, endings, min_stem: int) -> str:
    """Strip the longest matching ending, once, if >= min_stem chars
    remain. ``endings`` must be ordered longest-first."""
    for s in endings:
        if w.endswith(s) and len(w) - len(s) >= min_stem:
            return w[: -len(s)]
    return w


# ---------------------------------------------------------------------------
# Dutch: light analog of the text_nl chain (schema.xml:781-789 — the
# reference ships SnowballPorter(Dutch) + a StemmerOverride dictionary;
# modeled here as one inflection layer: -heden→-heid, plural -en/-s,
# final -e, with Dutch spelling repairs — undouble the closing
# consonant, final z→s / v→f)
# ---------------------------------------------------------------------------

_NL_ACCENT = str.maketrans("äëïöüáéíóúè", "aeiouaeioue")
_NL_VOWELS = set("aeiouy")


def _nl_repair(w: str) -> str:
    if len(w) > 3 and w[-1] == w[-2] and w[-1] not in _NL_VOWELS:
        w = w[:-1]  # katten → katt → kat
    if w.endswith("z"):
        w = w[:-1] + "s"  # huizen → huiz → huis
    elif w.endswith("v"):
        w = w[:-1] + "f"  # brieven → briev → brief
    return w


def dutch_light_stem(w: str) -> str:
    w = w.translate(_NL_ACCENT)
    if len(w) > 7 and w.endswith("heden"):
        return w[:-5] + "heid"  # mogelijkheden → mogelijkheid
    if len(w) > 4 and w.endswith("en") and w[-3] not in _NL_VOWELS:
        return _nl_repair(w[:-2])  # boeken → boek, huizen → huis
    if len(w) > 3 and w.endswith("s") and w[-2] not in "aeiouj":
        return w[:-1]  # tafels → tafel (keeps -js: meisjes → meisje)
    if len(w) > 4 and w.endswith("e") and w[-2] not in _NL_VOWELS:
        return _nl_repair(w[:-1])  # grote → grot (self-consistent key)
    return w


# ---------------------------------------------------------------------------
# Swedish: light analog of text_sv (schema.xml:848-856; the fieldType's
# own comment names SwedishLightStemFilter as the light option) — one
# layer of definite/plural/genitive endings
# ---------------------------------------------------------------------------

_SV_ENDINGS = (
    "arnas", "ernas", "ornas", "arna", "erna", "orna",
    "ande", "ende", "aste", "aren", "ades",
    "ade", "are", "ast", "ens", "ets", "ate",
    "ar", "er", "or", "en", "et", "an", "as", "es", "at",
    "a", "e", "n", "s",
)


def swedish_light_stem(w: str) -> str:
    return _strip_one(w, _SV_ENDINGS, 3)


# ---------------------------------------------------------------------------
# Norwegian (Bokmål): light analog of text_no (schema.xml:792-802; the
# fieldType comment names NorwegianLightStemFilter) — definite/plural
# -ene/-ane/-en/-et/-a/-er + genitive -s
# ---------------------------------------------------------------------------

_NO_ENDINGS = (
    "hetenes", "hetene", "hetens", "heten", "heter",
    "endes", "ande", "ende", "enes", "ene", "ens", "ers", "ets",
    "het",  # bare -het joins its own inflected forms (mulighet/muligheten)
    "en", "ar", "er", "as", "es", "et",
    "a", "e", "n", "s",
)


def norwegian_light_stem(w: str) -> str:
    return _strip_one(w, _NO_ENDINGS, 3)


# ---------------------------------------------------------------------------
# Danish: light analog of text_da (schema.xml:533-541, Snowball(Danish)
# in the reference) — shares Norwegian's ending structure plus -erne
# ---------------------------------------------------------------------------

_DA_ENDINGS = (
    "erendes", "erende", "hedens", "ernes", "heden", "heder",
    # the full -else family (not bare "els": stripping "els" off a stem
    # that single-strip already produced breaks idempotence)
    "elsens", "elsers", "elsen", "elser", "else",
    "erne", "ende", "enes", "eres", "eren", "erer", "edes", "ede",
    "ene", "ens", "ere",
    "er", "en", "es", "et", "e", "s",
)


def danish_light_stem(w: str) -> str:
    return _strip_one(w, _DA_ENDINGS, 3)


# ---------------------------------------------------------------------------
# Finnish: light analog of text_fi (schema.xml:601-610; the fieldType
# comment names FinnishLightStemFilter) — one locative/case layer, then
# one plural marker. Case endings carry both vowel-harmony forms.
# ---------------------------------------------------------------------------

_FI_CASE = (
    "issa", "issä", "ista", "istä", "illa", "illä", "ilta", "iltä",
    "ille", "iksi", "itta", "ittä",
    "ssa", "ssä", "sta", "stä", "lla", "llä", "lta", "ltä",
    "lle", "ksi", "tta", "ttä",
)
_FI_VOWELS = set("aeiouyäö")


def finnish_light_stem(w: str) -> str:
    # one locative/case layer (both vowel-harmony forms), then genitive/
    # illative -n, then plural -t, then the long-vowel residue the -n
    # strip exposes (taloon → taloo → talo; partitive kissaa → kissa)
    w = _strip_one(w, _FI_CASE, 3)
    if len(w) > 3 and w[-1] == "n":
        w = w[:-1]
    if len(w) > 3 and w[-1] == "t":
        w = w[:-1]
    if len(w) > 3 and w[-1] in _FI_VOWELS and w[-1] == w[-2]:
        w = w[:-1]
    return w


# ---------------------------------------------------------------------------
# Hungarian: light analog of text_hu (schema.xml:675-683; the fieldType
# comment names HungarianLightStemFilter) — accent fold + one layer of
# case/plural suffixes (all vowel-harmony forms)
# ---------------------------------------------------------------------------

_HU_ACCENT = str.maketrans("áéíóöőúüű", "aeiooouuu")
_HU_ENDINGS = (
    "okat", "eket", "öket", "akat", "ákat", "éket",
    "nak", "nek", "val", "vel", "tól", "től", "ról", "ről",
    "ban", "ben", "hoz", "hez", "höz", "nál", "nél", "ból", "ből",
    "ba", "be", "ra", "re", "on", "en", "ön",
    "ok", "ek", "ök", "ak", "at", "et", "öt", "ot",
    "t", "k", "n",
)


def hungarian_light_stem(w: str) -> str:
    w = w.translate(_HU_ACCENT)
    w = _strip_one(w, _HU_ENDINGS, 3)
    if len(w) > 3 and w[-1] in "ae":
        # linking/theme vowel exposed by the strip: házak→haza? no —
        # hazak→haz via -ak; this handles könyveket→konyveke→konyvek
        # second-layer residue and final -a/-e stems (alma/almák→alm)
        w = w[:-1]
    return w


# ---------------------------------------------------------------------------
# Czech: light analog of text_cz (schema.xml:523-531; CzechStemFilter is
# itself a published light stemmer, Dolamic & Savoy) — one case/number
# layer + final palatalization fold so alternating paradigms share a key
# ---------------------------------------------------------------------------

_CZ_ENDINGS = (
    "atech", "ětem", "atům",
    "ech", "ich", "ích", "ého", "ěmi", "emi", "ému",
    "ete", "eti", "iho", "ího", "ími", "imu", "ách", "ata", "aty",
    "ých", "ama", "ami", "ové", "ovi", "ými", "ům",
    "em", "es", "ém", "ím", "at", "ám", "os", "us", "ým", "mi", "ou",
    "a", "e", "i", "o", "u", "ů", "y", "é", "í", "ě", "á", "ý",
)
_CZ_PALATAL = {"č": "c", "ž": "z", "š": "s", "ň": "n", "ť": "t", "ď": "d",
               "c": "k", "z": "h"}


def czech_light_stem(w: str) -> str:
    w = _strip_one(w, _CZ_ENDINGS, 3)
    # fold the palatalized final back to its base so matka/matce,
    # kniha/knize collapse (k↔c, h↔z alternations)
    if w and w[-1] in _CZ_PALATAL:
        w = w[:-1] + _CZ_PALATAL[w[-1]]
    return w


# ---------------------------------------------------------------------------
# Bulgarian: light analog of text_bg (schema.xml:479-487; Lucene's
# BulgarianStemFilter implements the published BulStem light approach) —
# stage 1 strips the postposed definite article, stage 2 one
# plural/gender vowel layer
# ---------------------------------------------------------------------------

_BG_ARTICLES = ("ият", "ът", "ят", "та", "то", "те")
_BG_PLURAL = ("овете", "евете", "ове", "еве", "ища", "ище", "ия",
              "а", "я", "и", "е", "о")


def bulgarian_light_stem(w: str) -> str:
    w = _strip_one(w, _BG_ARTICLES, 3)
    return _strip_one(w, _BG_PLURAL, 3)


# ---------------------------------------------------------------------------
# Romanian: light analog of text_ro (schema.xml:817-826, Snowball in the
# reference) — comma-below/breve fold + one case/plural/article layer
# ---------------------------------------------------------------------------

_RO_ACCENT = str.maketrans("ăâîșşțţ", "aaisstt")
_RO_ENDINGS = (
    "urilor", "urile", "ilor", "elor", "iile", "ului",
    "uri", "ile", "ele", "iei",
    "ii", "ul", "le", "ea", "ie", "ia", "ua",
    "a", "e", "i", "u",
)


def romanian_light_stem(w: str) -> str:
    w = w.translate(_RO_ACCENT)
    return _strip_one(w, _RO_ENDINGS, 3)


# ---------------------------------------------------------------------------
# Catalan: light analog of text_ca (schema.xml:489-498 — elision of
# l'/d'/… like French/Italian, then Snowball(Catalan) in the reference)
# — accent fold + plural -es/-os/-is/-s + theme vowel
# ---------------------------------------------------------------------------

CA_ELISION = frozenset("dlmnst")  # lang/contractions_ca.txt article set

_CA_ACCENT = str.maketrans("àèéíïòóúü", "aeeiioouu")
_CA_PLURAL = ("es", "os", "is", "ns", "s")
_CA_VOWEL = ("a", "e", "o")


def catalan_light_stem(w: str) -> str:
    # plural layer then theme vowel: cases→cas→cas, casa→cas;
    # traduccions→traduccio→traducci, traducció→traduccio→traducci
    w = w.translate(_CA_ACCENT)
    w = _strip_one(w, _CA_PLURAL, 3)
    return _strip_one(w, _CA_VOWEL, 3)


# ---------------------------------------------------------------------------
# Greek: light analog of text_el (schema.xml:556-565 — GreekLowerCase +
# GreekStemFilter) — final-sigma + tonos folding, then one noun/adjective
# inflection layer
# ---------------------------------------------------------------------------

_EL_FOLD = str.maketrans("άέήίόύώϊϋΐΰς", "αεηιουωιυιυσ")
# endings are matched AFTER _EL_FOLD, so final sigma is spelled σ here
_EL_ENDINGS = (
    "ματοσ", "ματα", "ματων",
    "ουσα", "ουμε", "εται", "ονται",
    "ουσ", "εισ", "ων",
    "οσ", "ου", "ον", "οι", "εσ", "ασ", "ησ", "αι", "α", "η", "ο", "ι", "ε",
)


def greek_light_stem(w: str) -> str:
    # strip to fixpoint: Greek stems routinely end in a strippable
    # vowel+σ pair themselves (μεταφραση→μεταφρασ→μεταφρ), so a single
    # strip would not be idempotent; the ≥3 guard bounds the loop
    w = w.translate(_EL_FOLD)
    while True:
        nw = _strip_one(w, _EL_ENDINGS, 3)
        if nw == w:
            return w
        w = nw


# ---------------------------------------------------------------------------
# Turkish: light analog of text_tr (schema.xml:870-878 —
# TurkishLowerCase + Snowball(Turkish) in the reference). Agglutinative:
# up to three longest-first strips (plural → possessive → case), then
# final consonant de-voicing so mutated stems share a key
# (kitabı → kitab → kitap). Python str.lower() maps I→i rather than
# Turkish ı — self-consistent on both index and query side, which is the
# contract; dotted-i parity with TurkishLowerCaseFilter is not claimed.
# ---------------------------------------------------------------------------

_TR_ENDINGS = (
    "lardan", "lerden", "larda", "lerde", "ların", "lerin",
    "lara", "lere", "ları", "leri", "larla", "lerle",
    "lar", "ler",
    "dan", "den", "tan", "ten", "nın", "nin", "nun", "nün",
    "da", "de", "ta", "te", "ın", "in", "un", "ün",
    "sı", "si", "su", "sü", "yı", "yi", "yu", "yü",
    "ı", "i", "u", "ü",
)
_TR_DEVOICE = {"b": "p", "c": "ç", "d": "t", "ğ": "k"}


def turkish_light_stem(w: str) -> str:
    for _ in range(3):
        nw = _strip_one(w, _TR_ENDINGS, 2)
        if nw == w:
            break
        w = nw
    if w and w[-1] in _TR_DEVOICE:
        w = w[:-1] + _TR_DEVOICE[w[-1]]
    return w


# ---------------------------------------------------------------------------
# Persian: text_fa (schema.xml:588-598) applies NO stemmer — the chain is
# PersianCharFilter (ZWNJ→space; our tokenizer already splits on ZWNJ,
# a non-letter) + ArabicNormalization + PersianNormalization. So the
# token map is pure normalization: Arabic-script diacritic removal and
# letter folding, then the Persian yeh/kaf/heh folds.
# ---------------------------------------------------------------------------

_FA_DIACRITICS = dict.fromkeys(map(ord, "ًٌٍَُِّْـ"))
_FA_FOLD = str.maketrans(
    {
        "آ": "ا", "أ": "ا", "إ": "ا", "ٱ": "ا",  # alef variants → bare alef
        "ي": "ی", "ى": "ی", "ئ": "ی",  # arabic yeh / maksura → farsi yeh
        "ك": "ک",  # arabic kaf → keheh
        "ة": "ه", "ۀ": "ه", "ہ": "ه",  # heh variants
        "ؤ": "و",
    }
)


def persian_normalize(w: str) -> str:
    return w.translate(_FA_DIACRITICS).translate(_FA_FOLD)


# ---------------------------------------------------------------------------
# Hindi: light analog of text_hi (schema.xml:651-662 — IndicNormalization
# + HindiNormalization + HindiStemFilter, the published Ramanathan & Rao
# light stemmer): nukta fold, then one longest matra/plural suffix strip
# ---------------------------------------------------------------------------

# Nukta forms appear both precomposed (U+0958-095F) and decomposed
# (base letter + combining nukta U+093C); fold the former to the base
# letter, delete the latter.
_HI_NUKTA = str.maketrans(
    {"\u0958": "\u0915", "\u0959": "\u0916", "\u095a": "\u0917",
     "\u095b": "\u091c", "\u095c": "\u0921", "\u095d": "\u0922",
     "\u095e": "\u092b", "\u095f": "\u092f",
     "\u0929": "\u0928", "\u0931": "\u0930", "\u0934": "\u0933",
     "\u093c": None}
)
_HI_ENDINGS = (
    "ियों", "ियाँ", "ियां", "ाओं", "ाएं", "ाएँ", "ुओं", "ुएं",
    "ओं", "एं", "ें", "ों", "ाँ", "ां", "ीं", "ुं",
    "ा", "ि", "ी", "ु", "ू", "े", "ो", "ं", "ृ",
)


def hindi_light_stem(w: str) -> str:
    w = w.translate(_HI_NUKTA)
    return _strip_one(w, _HI_ENDINGS, 2)


# ---------------------------------------------------------------------------
# Indonesian: light analog of text_id (schema.xml:696-704 —
# IndonesianStemFilter, the published Tala stemmer; the fieldType's own
# comment offers the inflectional-only setting). Order matters: particle,
# possessive, then ONE derivational suffix and ONE prefix.
# ---------------------------------------------------------------------------

_ID_PARTICLES = ("lah", "kah", "tah", "pun")
_ID_POSSESSIVE = ("nya", "ku", "mu")
_ID_SUFFIXES = ("kan", "an", "i")
_ID_PREFIXES = ("meng", "meny", "mem", "men", "me",
                "peng", "peny", "pem", "pen",
                "ber", "bel", "be", "ter", "di", "ke", "se", "per", "pe")


def indonesian_light_stem(w: str) -> str:
    w = _strip_one(w, _ID_PARTICLES, 3)
    w = _strip_one(w, _ID_POSSESSIVE, 3)
    w = _strip_one(w, _ID_SUFFIXES, 3)
    for p in _ID_PREFIXES:
        if w.startswith(p) and len(w) - len(p) >= 3:
            w = w[len(p):]
            break
    return w


# ---------------------------------------------------------------------------
# Basque: light analog of text_eu (schema.xml:578-587, Snowball(Basque)
# in the reference). Agglutinative determiner+case endings; one
# longest-first layer covers the article (-a/-ak) and the common cases.
# Bare -etik (consonant-root ablative) is deliberately absent: it
# over-strips vowel-final roots (etxetik), which -tik serves exactly.
# ---------------------------------------------------------------------------

_EU_ENDINGS = (
    "arengatik", "arentzat", "arekin", "aren",
    "etatik", "etarako", "etako", "etara", "etan",
    "engatik", "entzat", "ekin", "rako", "tik",
    "ari", "ak", "an", "ek", "ei", "en", "ra", "ko", "a",
)


def basque_light_stem(w: str) -> str:
    return _strip_one(w, _EU_ENDINGS, 3)


# ---------------------------------------------------------------------------
# Irish: light analog of text_ga (schema.xml:626-639 — Elision
# (lang/contractions_ga.txt: d m b) + IrishLowerCase + Snowball(Irish)).
# Initial-mutation folding so mutated forms share the base key: eclipsis
# clusters (mb-/gc-/nd-/bhf-/ng-/bp-/dt- never begin unmutated words)
# and lenition (consonant + h). IrishLowerCaseFilter's n-/t- prothesis
# handling needs the original CASE (n- before an uppercase vowel), which
# a lowercased stream cannot recover — not modeled, by construction.
# ---------------------------------------------------------------------------

GA_ELISION = frozenset("dmb")  # lang/contractions_ga.txt verbatim

_GA_ECLIPSIS = {"bhf": "f", "mb": "b", "gc": "c", "nd": "d",
                "ng": "g", "bp": "p", "dt": "t"}
_GA_SUFFIXES = ("eanna", "anna", "acha", "aí", "í")


def irish_light_stem(w: str) -> str:
    for pre, base in _GA_ECLIPSIS.items():
        if w.startswith(pre) and len(w) - len(pre) >= 2:
            w = base + w[len(pre):]
            break
    else:
        if len(w) > 3 and w[1] == "h" and w[0] in "bcdfgmpst":
            w = w[0] + w[2:]  # lenition: charr → carr, bhord → bord
    return _strip_one(w, _GA_SUFFIXES, 3)


# ---------------------------------------------------------------------------
# Galician: light analog of text_gl (schema.xml:640-650; the fieldType's
# own comment offers GalicianMinimalStemFilter — plural-only — as the
# less aggressive option, which is what this models): accent fold +
# plural -ns → -n (canción/cancións) and plain -s.
# ---------------------------------------------------------------------------

_GL_ACCENT = str.maketrans("áéíóúü", "aeiouu")


def galician_light_stem(w: str) -> str:
    w = w.translate(_GL_ACCENT)
    if w.endswith("ns") and len(w) >= 5:
        return w[:-1]
    if w.endswith("s") and len(w) >= 4:
        return w[:-1]
    return w


# ---------------------------------------------------------------------------
# Armenian: light analog of text_hy (schema.xml:686-695,
# Snowball(Armenian) in the reference) — one layer of plural (-ner/-er
# with case) + case/article endings. Ablaut alternations (գիրք/գրքեր)
# are lexical and out of scope for a light stemmer.
# ---------------------------------------------------------------------------

_HY_ENDINGS = (
    "ներում", "ներով", "ներին", "ներից", "ների", "ները", "ներ",
    "երում", "երով", "երից", "երի", "երը", "եր",
    "ում", "ով", "ից", "ին", "ի", "ը", "ն",
)


def armenian_light_stem(w: str) -> str:
    return _strip_one(w, _HY_ENDINGS, 3)


# ---------------------------------------------------------------------------
# Latvian: light analog of text_lv (schema.xml:771-780; LatvianStemFilter
# is itself a published light stemmer) — one declension layer, macrons
# kept (phonemic in Latvian; the Lucene filter keeps them too).
# ---------------------------------------------------------------------------

_LV_ENDINGS = (
    "ajiem", "ajai", "ajam", "ajās",
    "iem", "ām", "am", "ās", "as", "us", "os", "es",
    "ij", "īm", "em", "um", "ai", "ei",
    "a", "i", "e", "u", "s", "š",
)


def latvian_light_stem(w: str) -> str:
    return _strip_one(w, _LV_ENDINGS, 3)


# ---------------------------------------------------------------------------
# Polish: light analog of text_pl (schema.xml; the reference ships
# StempelPolishStemFilter — a STATISTICAL, dictionary-trained stemmer).
# No Stempel table ships here, so this is an honestly-labeled original
# light rule set in the module's usual contract: one layer of
# noun/adjective number+case inflection with minimum-stem guards,
# diacritics kept (ż/ź/ł are phonemic; Stempel keeps them too). The
# consonant alternations Stempel's tables learn (k→c, t→ci, ia→ie) are
# NOT modeled — Stempel parity is explicitly not claimed, mirroring
# ja_seg's framing.
# ---------------------------------------------------------------------------

_PL_ENDINGS = (
    "iach", "iami", "iego", "iemu", "owie", "ości",
    "iom", "iem", "ego", "emu", "ymi", "imi", "ach", "ami", "owi",
    "ych", "ich", "ość",
    "ów", "om", "em", "ej", "ym", "im", "ie", "ia", "iu", "ię", "ią",
    "a", "ą", "e", "ę", "i", "o", "u", "y",
)


def polish_light_stem(w: str) -> str:
    return _strip_one(w, _PL_ENDINGS, 3)
