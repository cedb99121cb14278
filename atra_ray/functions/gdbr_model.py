"""GDBR (GDPR-banner) model: featurizer + linear scorer + banner corpus.

The reference trains a per-language liblinear SVR over TF-IDF of tokenized
DOM-node text (atra/src/gdbr/identifier.rs:80-759, svm/src/classifier.rs,
training entry at the bottom of identifier.rs) on a curated consent-banner
corpus. liblinear isn't available here, so the equivalent is a per-language
LOGISTIC REGRESSION over hashed term frequencies trained by
``tools/train_gdbr.py`` (plain numpy gradient descent, seeded) on the
synthetic banner/prose corpus below; weights ship as
``atra_ray/data/gdbr_weights.npz`` and load once per actor (T5 pattern).

BANNER_TEMPLATES is public-knowledge consent-banner phrasing (the same
corpus family the reference's models were curated from); the fixture
generator composes its injected banners from the same pool — i.e. the
fixtures model the real-world situation where banners share a phrase
distribution with the training corpus.
"""

from __future__ import annotations

import re
from functools import lru_cache
from pathlib import Path

import numpy as np

__all__ = [
    "BANNER_TEMPLATES",
    "FEATURE_DIM",
    "featurize",
    "hashed_term_set",
    "load_weights",
    "score_text",
    "tokenize",
]

FEATURE_DIM = 4096
_TOKEN_RE = re.compile(r"[^\W\d_]+", re.UNICODE)

BANNER_TEMPLATES: dict[str, list[str]] = {
    "eng": [
        "we use cookies to improve your experience on our site",
        "this website uses cookies to personalize content and ads",
        "by clicking accept you agree to our use of cookies",
        "accept all cookies or manage your preferences",
        "we and our partners process personal data for advertising",
        "you can withdraw your consent at any time in the settings",
        "read our privacy policy and cookie policy for details",
        "manage your privacy settings and tracking preferences",
        "your consent helps us provide a better service",
        "decline optional cookies or accept tracking for analytics",
    ],
    "deu": [
        "diese website verwendet cookies zur verbesserung ihres erlebnisses",
        "wir verwenden cookies um inhalte und anzeigen zu personalisieren",
        "mit klick auf akzeptieren stimmen sie der verwendung von cookies zu",
        "alle cookies akzeptieren oder einstellungen verwalten",
        "wir und unsere partner verarbeiten personenbezogene daten",
        "sie können ihre einwilligung jederzeit in den einstellungen widerrufen",
        "lesen sie unsere datenschutzerklärung für weitere informationen",
        "datenschutzeinstellungen und tracking verwalten",
        "ihre zustimmung hilft uns unseren dienst zu verbessern",
        "optionale cookies ablehnen oder tracking akzeptieren",
    ],
    "fra": [
        "ce site utilise des cookies pour améliorer votre expérience",
        "nous utilisons des cookies pour personnaliser le contenu",
        "en cliquant sur accepter vous acceptez l'utilisation des cookies",
        "accepter tous les cookies ou gérer vos préférences",
        "nous et nos partenaires traitons des données personnelles",
        "vous pouvez retirer votre consentement à tout moment",
        "lisez notre politique de confidentialité pour plus de détails",
        "gérer vos préférences de confidentialité et de suivi",
        "votre consentement nous aide à améliorer notre service",
        "refuser les cookies optionnels ou accepter le suivi",
    ],
    "spa": [
        "este sitio web utiliza cookies para mejorar su experiencia",
        "usamos cookies para personalizar el contenido y los anuncios",
        "al hacer clic en aceptar usted acepta el uso de cookies",
        "aceptar todas las cookies o administrar sus preferencias",
        "nosotros y nuestros socios procesamos datos personales",
        "puede retirar su consentimiento en cualquier momento",
        "lea nuestra política de privacidad para más detalles",
        "administrar sus preferencias de privacidad y seguimiento",
        "su consentimiento nos ayuda a mejorar nuestro servicio",
        "rechazar las cookies opcionales o aceptar el seguimiento",
    ],
}


def tokenize(text: str) -> list[str]:
    return _TOKEN_RE.findall(text.lower())


def _token_index(tok: str) -> int:
    # stable across processes (never the per-process builtin hash)
    import hashlib

    return (
        int.from_bytes(
            hashlib.blake2b(tok.encode(), digest_size=4).digest(), "big"
        )
        % FEATURE_DIM
    )


@lru_cache(maxsize=65536)
def _cached_index(tok: str) -> int:
    return _token_index(tok)


def hashed_term_set(text: str) -> set[int]:
    """Distinct hashed feature indices of a document — the unit the
    distributed DF pass (stages/text_analysis.hashed_doc_frequency)
    counts."""
    return {_cached_index(t) for t in tokenize(text)}


def featurize(text: str, idf: np.ndarray | None = None) -> np.ndarray:
    """Hashed TF-IDF vector (the hashing-trick form of the reference's
    TF-IDF featurizer, tf_idf.rs): L1-normalized term frequencies,
    reweighted by the corpus-trained ``idf`` vector and L2-normalized.
    With ``idf=None`` this degrades to plain L1 TF (the pre-IDF model).
    IDF makes function-word-salad prose score ~zero feature mass — only
    corpus-rare terms (consent/cookie vocabulary) carry weight, which is
    what makes the banner/prose margin robust to vocabulary drift."""
    x = np.zeros(FEATURE_DIM, dtype=np.float64)
    toks = tokenize(text)
    if not toks:
        return x
    for t in toks:
        x[_cached_index(t)] += 1.0
    x /= len(toks)
    if idf is not None:
        # Reweight by IDF but keep the TOKEN-COUNT normalization (no
        # renormalization over idf mass): x_i = (count_i/N)·idf_i. The
        # banner terms' contribution to z then shrinks LINEARLY as prose
        # tokens are added — even when the prose is low-IDF function
        # words — which is the dilution property the subtree-removal
        # climb in stages/gdbr.clean_html_dom relies on (the banner <div>
        # scores high, its prose-diluted ancestors fall below threshold).
        # An idf-share (L1/L2) renorm would NOT have it: common-word
        # prose carries no idf mass, so a banner's share would stay high
        # all the way to <html> and the climb would remove the page.
        x *= idf
    return x


def score_text(
    text: str, w: np.ndarray, b: float, idf: np.ndarray | None = None
) -> float:
    """Banner score: the epsilon-SVR decision value ``w.x + b`` (targets
    trained to +1 banner / -1 prose, mirroring the reference's liblinear
    SVR predict(), svm/src/classifier.rs:249) mapped affinely to the
    runtime's [~0, ~1] scale — (z+1)/2, UNclipped so the max-subtree
    ordering above 1.0 survives. The stage's 0.5 threshold is exactly
    the SVR's natural z=0 boundary."""
    z = float(featurize(text, idf) @ w + b)
    return (z + 1.0) / 2.0


_WEIGHTS_PATH = Path(__file__).resolve().parent.parent / "data" / "gdbr_weights.npz"


def load_weights(
    path: str | Path | None = None,
) -> dict[str, tuple[np.ndarray, float, np.ndarray | None]]:
    """lang -> (w, b, idf); the '*' entry is the cross-language fallback.
    ``idf`` is the shared corpus IDF vector (same array object for every
    language; None for pre-IDF weight files)."""
    z = np.load(path or _WEIGHTS_PATH)
    idf = z["idf"] if "idf" in z.files else None
    out: dict[str, tuple[np.ndarray, float, np.ndarray | None]] = {}
    for key in z.files:
        if key.startswith("w_"):
            lang = key[2:]
            out[lang] = (z[key], float(z[f"b_{lang}"]), idf)
    return out
