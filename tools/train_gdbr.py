"""Offline GDBR model training (the analog of the reference's training
entry at the bottom of atra/src/gdbr/identifier.rs + svm/ crate).

Per language: logistic regression over hashed TF features
(functions/gdbr_model.py), full-batch gradient descent, seeded and fully
deterministic. Positives = consent-banner sentences composed from
BANNER_TEMPLATES with word-level variation; negatives = prose sentences
from the fixture vocabulary + generic web prose. Writes
``atra_ray/data/gdbr_weights.npz`` (committed artifact, loaded once per
actor at runtime) and prints train accuracy per language.

Usage: cd /root/repo && python tools/train_gdbr.py
"""

from __future__ import annotations

import random
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from atra_ray.functions.gdbr_model import (  # noqa: E402
    BANNER_TEMPLATES,
    FEATURE_DIM,
    featurize,
)
from atra_ray.functions.langdetect import LANG_STOPWORDS  # noqa: E402

SEED = 42

# generic prose vocabulary (mirrors the fixture generator's content pools
# plus neutral web-page words) — the negative class
_PROSE = {
    "eng": (
        "crawler data engine page website index search result link text "
        "article news section title content image story report table list"
    ).split(),
    "deu": (
        "seite daten suche netz inhalt verzeichnis ergebnis wort text bild "
        "artikel nachricht abschnitt titel liste tabelle bericht"
    ).split(),
    "fra": (
        "page moteur recherche contenu texte image lien résultat mot site "
        "article nouvelle section titre liste tableau rapport"
    ).split(),
    "spa": (
        "página motor búsqueda contenido texto imagen enlace resultado "
        "palabra sitio artículo noticia sección título lista tabla"
    ).split(),
}


def _banner_sentences(lang: str, rng: random.Random, n: int) -> list[str]:
    """Template pool + word-level variation (dropout / duplication) so the
    model learns the phrase distribution, not exact strings."""
    out = []
    templates = BANNER_TEMPLATES[lang]
    for _ in range(n):
        s = rng.choice(templates).split()
        if rng.random() < 0.5 and len(s) > 4:  # drop a word
            s.pop(rng.randrange(len(s)))
        if rng.random() < 0.3:  # join two templates
            s += rng.choice(templates).split()[: rng.randint(2, 6)]
        out.append(" ".join(s))
    return out


def _prose_sentences(lang: str, rng: random.Random, n: int) -> list[str]:
    pool = sorted(LANG_STOPWORDS[lang]) + _PROSE[lang]
    out = [
        " ".join(rng.choice(pool) for _ in range(rng.randint(6, 20)))
        for _ in range(n)
    ]
    # short generic fragments (titles, nav items): high per-token TF on
    # shared vocabulary like "website" must not flip them positive
    out += [
        " ".join(rng.choice(pool) for _ in range(rng.randint(2, 5)))
        for _ in range(n // 2)
    ]
    return out


def train_one(lang: str) -> tuple[np.ndarray, float, float]:
    rng = random.Random(SEED + sorted(BANNER_TEMPLATES).index(lang))  # stable, never builtin hash
    pos = _banner_sentences(lang, rng, 300)
    neg = _prose_sentences(lang, rng, 600)
    X = np.stack([featurize(s) for s in pos + neg])
    y = np.r_[np.ones(len(pos)), np.zeros(len(neg))]
    w = np.zeros(FEATURE_DIM)
    b = 0.0
    lr, l2 = 5.0, 1e-4
    for _ in range(400):  # full-batch GD; tiny problem, converges fast
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * (X.T @ g / len(y) + l2 * w)
        b -= lr * g.mean()
    acc = float((((X @ w + b) > 0) == y.astype(bool)).mean())
    return w, b, acc


def main() -> None:
    out = {}
    accs = {}
    for lang in BANNER_TEMPLATES:
        w, b, acc = train_one(lang)
        out[f"w_{lang}"] = w
        out[f"b_{lang}"] = np.float64(b)
        accs[lang] = acc
    # cross-language fallback: train on the union
    rng = random.Random(SEED)
    pos, neg = [], []
    for lang in BANNER_TEMPLATES:
        pos += _banner_sentences(lang, rng, 100)
        neg += _prose_sentences(lang, rng, 200)
    X = np.stack([featurize(s) for s in pos + neg])
    y = np.r_[np.ones(len(pos)), np.zeros(len(neg))]
    w = np.zeros(FEATURE_DIM)
    b = 0.0
    for _ in range(400):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= 5.0 * (X.T @ g / len(y) + 1e-4 * w)
        b -= 5.0 * g.mean()
    out["w_*"] = w
    out["b_*"] = np.float64(b)
    accs["*"] = float((((X @ w + b) > 0) == y.astype(bool)).mean())

    dest = Path(__file__).resolve().parent.parent / "atra_ray" / "data" / "gdbr_weights.npz"
    np.savez_compressed(dest, **out)
    print({k: round(v, 4) for k, v in accs.items()}, "->", dest)


if __name__ == "__main__":
    main()
