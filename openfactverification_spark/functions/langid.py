"""Char-n-gram language-ID model with literal weights — the model-based
upgrade of the stopword heuristic (q_lang_id). fastText-style in miniature:
a linear scorer over character-bigram counts, trained offline on embedded
public-text samples and shipped as constants, so scoring is ONE projection
(no UDF, no join, no shuffle) and the DuckDB oracle computes the identical
linear model.

Training (deterministic, pure Python at import): per language, character
bigrams of the sample are ranked by discriminativeness — frequency times
positive log-odds against the best competing language — and the top_k grams
get weight log(p_lang(g) / max_other(g)) rounded to 4 dp. Classification is
argmax of sum(count(g) * weight[lang][g]); a document with no
characteristic grams scores 0 everywhere and falls back to the first
language in LANGS order (the corpus-majority default, same role as the
stopword baseline's 'other' bucket).

Substring counts use the non-overlapping replace() trick
((len(t) - len(replace(t, g, ''))) / len(g)) — identical semantics in both
engines, branch-free, whole-stage-codegen'd.
"""

from __future__ import annotations

import math
from collections import Counter

# Embedded public-text training samples: common function words and short
# phrases characteristic of each language (the classic char-level signal:
# umlauts/eszett for de, accents/cedilla for fr, enye/accents for es, CJK for
# zh, plain-ASCII function words for en).
SAMPLES: dict[str, str] = {
    "en": (
        "the quick brown fox jumps over the lazy dog and then it was for "
        "with that this they them there which when what would could should "
        "of the and to in is was that it for on with as his they at be this"
    ),
    "de": (
        "der und die das ist nicht ein eine mit für über schön größe straße "
        "müssen können während zwischen außerdem natürlich möchte hätte wäre "
        "ich bin du bist er sie es wir ihr sind werden wurde durch gegen ohne"
    ),
    "fr": (
        "le la et les des est une dans pour avec était déjà très élève çà "
        "français garçon être été après même première fenêtre réussi où "
        "je suis tu es il elle nous vous ils sont avait comme plus aussi"
    ),
    "es": (
        "el la y los las es una en para con muy también está señor niño año "
        "así están según corazón mañana pequeño español información acción "
        "yo soy tú eres él ella nosotros son había como más pero porque"
    ),
    # frequency-realistic: the common characters repeat the way running
    # Chinese text repeats them, so feature selection ranks by real frequency
    "zh": (
        "的是的了一不的是人在有的了我是一的不在有他了是的一我在不人有"
        "了的是一我他在这个的了是一不我在人有的他了是一"
    ),
}

LANGS = ("en", "de", "es", "fr", "zh")  # argmax priority order, en first
NGRAM = 2
TOP_K = 8
# minimum log-odds margin: a feature must be ~2x more likely in its language
# than in ANY competitor (other languages + background), or generic
# high-frequency letters ('e', 't') sneak in on sheer frequency and fire on
# every document regardless of language
MIN_LODDS = 0.7

# Background corpus sample (the synthetic documents vocabulary): candidate
# grams must ALSO beat this distribution, or high-frequency grams the target
# language merely shares with generic English text ('ch', 'er', 'in' for de)
# become features and fire on every English-vocabulary document. With the
# background as a competitor, what survives is the charset-level signal
# (umlauts, accents, enye, CJK) — which is the honest discriminator a
# char-n-gram model has at this scale.
BACKGROUND = (
    "scan column window order sort part agg value line key join merge query "
    "group vector hash slow stream filter fast the spark batch table row "
    "data small big dup customer a the fast key order sort table scan merge"
)


def _grams(text: str) -> Counter:
    """Char 1- and 2-gram counts. Unigram candidates matter: the strongest
    signals are single characters the competitors never emit (umlauts,
    accents, enye, CJK), and a one-char feature fires on any occurrence
    rather than needing an exact adjacent pair to recur."""
    t = text.lower()
    c = Counter(t[i : i + 2] for i in range(len(t) - 1))
    c.update(t)
    return c


def train_char_ngram(
    samples: dict[str, str] | None = None, top_k: int = TOP_K
) -> dict[str, list[tuple[str, float]]]:
    """lang -> [(gram, weight)] with positive log-odds weights, deterministic
    (ties break on gram text)."""
    samples = SAMPLES if samples is None else samples
    freq = {l: _grams(s) for l, s in samples.items()}
    freq["__bg__"] = _grams(BACKGROUND)
    tot = {l: max(1, sum(c.values())) for l, c in freq.items()}
    floor = 0.5 / max(tot.values())
    model: dict[str, list[tuple[str, float]]] = {}
    for lang in sorted(samples):
        competitors = [o for o in freq if o != lang]  # other langs + background
        scored = []
        for g, c in freq[lang].items():
            if "'" in g or "|" in g:
                continue  # keep grams SQL-literal-safe and separator-free
            p = c / tot[lang]
            p_other = max(max(freq[o][g] / tot[o] for o in competitors), floor)
            lodds = math.log(p / p_other)
            if lodds >= MIN_LODDS:
                scored.append((round(p * lodds, 10), g))
        scored.sort(key=lambda t: (-t[0], t[1]))
        model[lang] = [
            (g, round(math.log((freq[lang][g] / tot[lang]) / floor), 4))
            for _, g in scored[:top_k]
        ]
    return model


MODEL: dict[str, list[tuple[str, float]]] = train_char_ngram()


def classify(text: str) -> str:
    """Pure-Python reference scorer (tests pin both engines against it)."""
    t = text.lower()
    best_lang, best = LANGS[0], float("-inf")
    for lang in LANGS:
        s = 0.0
        for g, w in MODEL[lang]:
            cnt = (len(t) - len(t.replace(g, ""))) // len(g)
            s += cnt * w
        s = round(s, 6)
        if s > best:
            best, best_lang = s, lang
    return best_lang


# Deterministic per-language plants for the fixture corpus: the synthetic
# documents table labels `lang` but draws TEXT from one shared English-ish
# vocabulary (measured: a word-level NB classifier scores at chance), so —
# exactly like q_pii_redact's planted PII and q_decontaminate_eval's canary —
# the query seeds each labeled doc with a short characteristic phrase and the
# oracle checks the DETECTION, not the planting. The phrases are ordinary
# function words drawn from SAMPLES.
PLANT_TAILS: dict[str, str] = {
    "en": " of the and to in that it was for with",
    "de": " der und die das ist nicht für schön über größe",
    "fr": " le la et les est déjà très être fenêtre où",
    "es": " el la y los es una señor niño año también",
    "zh": " 的一是了我不人在他有",
}
