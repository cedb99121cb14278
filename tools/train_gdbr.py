"""Offline GDBR model training (the analog of the reference's training
entry at the bottom of atra/src/gdbr/identifier.rs + svm/ crate, with the
TF-IDF corpus statistics of text_processing/src/tf_idf.rs).

Per language: L2-regularized L2-loss epsilon-insensitive SVR over hashed
TF-IDF features (functions/gdbr_model.py) — the same model family as the
reference's liblinear L2R_L2LOSS_SVR — full-batch gradient descent with a
Lipschitz-derived step, seeded and fully deterministic. The pipeline
mirrors the reference's shape:

1. **Corpus**: the deterministic fixture generator at sf=0.003 — the same
   page distribution the engine crawls (seed fixed, so training is
   reproducible bit-for-bit).
2. **IDF**: a DISTRIBUTED document-frequency pass over the corpus
   (stages/text_analysis.hashed_doc_frequency — per-block partial DF
   vectors summed on the driver; the vector-combiner form of
   ``groupby(term).count()``), smoothed ``idf = ln((N+1)/(df+1)) + 1``.
   Function words get ~minimum IDF, so prose made of them carries almost
   no feature mass; the consent vocabulary is corpus-rare and dominates.
3. **Negatives**: prose lines and multi-line windows sampled from the
   corpus's own CLEAN text (the gdbr_oracle table minus banners) — the
   true distribution the runtime scorer sees, not a hand-authored pool.
4. **Positives**: consent-banner sentences composed from BANNER_TEMPLATES
   with word-level variation (dropout / template joins), the same
   public-knowledge phrase family the reference's corpus was curated from.

Writes ``atra_ray/data/gdbr_weights.npz`` (w_<lang>, b_<lang>, shared
``idf``; committed artifact, loaded once per actor at runtime) and prints
train accuracy per language.

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

SEED = 42
TRAIN_SF = 0.003
TRAIN_DIR = "/tmp/atra_fixtures/gdbr_train_sf0.003"


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


def _corpus_texts() -> tuple[list[str], np.ndarray]:
    """-> (clean page texts, idf vector). Generates the training corpus
    (cached), runs the distributed DF pass, loads the clean-text table."""
    import ray

    from atra_ray.sources.fixtures import generate
    from atra_ray.stages.text_analysis import hashed_doc_frequency

    fx = generate(TRAIN_DIR, TRAIN_SF)
    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            logging_level="ERROR",
        )
    # IDF over the CLEAN text (banners excluded): the consent vocabulary
    # then has ~zero corpus DF and maximal IDF — the widest possible
    # banner/prose margin; prose function words sit at minimum IDF.
    df_vec, n_docs = hashed_doc_frequency(
        str(fx / "gdbr_oracle.parquet"), text_col="clean_text"
    )
    idf = np.log((n_docs + 1.0) / (df_vec + 1.0)) + 1.0

    import pyarrow.parquet as pq

    texts = pq.read_table(
        fx / "gdbr_oracle.parquet", columns=["clean_text"]
    ).column("clean_text").to_pylist()
    ray.shutdown()
    return [t for t in texts if t], idf


def _negative_samples(
    texts: list[str], rng: random.Random, n: int, lang: str | None = None
) -> list[str]:
    """Prose negatives at the granularity the DOM scorer sees: single
    text-node lines, multi-line subtree windows, short fragments, PLUS the
    two cases the subtree-removal climb depends on —

    - **diluted mixtures** (one banner sentence inside ≥3× prose): the
      shape of a banner's *ancestors* (<body>), which must score BELOW
      threshold so the climb stops at the banner container;
    - **out-of-vocabulary prose** (tokens the corpus never saw, hashed to
      zero-weight buckets): classifiable only through a negative bias, so
      the optimizer is forced to set b < 0 and unseen-vocabulary pages
      default to 'not a banner'."""
    lines = [ln for t in texts for ln in t.split("\n") if len(ln.split()) >= 2]
    banner_pool = (
        BANNER_TEMPLATES[lang] if lang else sum(BANNER_TEMPLATES.values(), [])
    )
    out = []
    for j in range(n):
        r = rng.random()
        if r < 0.35:  # one text node
            out.append(rng.choice(lines))
        elif r < 0.60:  # a subtree: 2-6 consecutive lines of one page
            t = rng.choice(texts).split("\n")
            k = rng.randint(2, 6)
            i = rng.randrange(max(1, len(t) - k + 1))
            out.append("\n".join(t[i : i + k]))
        elif r < 0.72:  # short fragment (title/nav)
            ws = rng.choice(lines).split()
            out.append(" ".join(ws[: rng.randint(2, 5)]))
        elif r < 0.90:  # banner-diluted ancestor: 1 banner + 4-8 prose lines
            mix = [rng.choice(banner_pool)] + [
                rng.choice(lines) for _ in range(rng.randint(4, 8))
            ]
            rng.shuffle(mix)
            out.append("\n".join(mix))
        else:  # OOV prose (deterministic nonsense tokens)
            out.append(
                " ".join(f"zqv{rng.randrange(50000)}x" for _ in range(rng.randint(6, 20)))
            )
    return out


def _fit(X: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, float, float]:
    """L2-regularized L2-loss epsilon-insensitive SVR (the liblinear
    L2R_L2LOSS_SVR primal the reference trains — svm/src/config.rs
    solver/epsilon/cost knobs, predict() in classifier.rs:249):

        min_w  0.5 ||w||^2 + C * sum_i max(0, |w.x_i + b - t_i| - eps)^2

    with regression targets t = +1 (banner) / -1 (prose), full-batch
    gradient descent, seeded and deterministic. The decision value
    w.x + b is mapped affinely to [~0, ~1] by score_text so the runtime
    0.5 threshold sits exactly on the SVR's natural t=0 boundary."""
    t = 2.0 * y - 1.0
    w = np.zeros(FEATURE_DIM)
    b = 0.0
    C, eps = 4.0, 0.1
    n = len(t)
    # step = 1/L with L the smooth loss's Lipschitz constant
    # (2C/n)·λmax(XᵀX [+1 bias]) + 1/n, λmax via deterministic power
    # iteration — the squared-eps gradient is unbounded, so a hand-picked
    # rate diverges where the old bounded logistic gradient did not
    v = np.ones(X.shape[1]) / np.sqrt(X.shape[1])
    for _ in range(50):
        u = X.T @ (X @ v)
        v = u / (np.linalg.norm(u) or 1.0)
    lam = float(v @ (X.T @ (X @ v)))
    lr = 1.0 / ((2.0 * C / n) * (lam + 1.0) + 1.0 / n)
    for _ in range(2000):
        r = X @ w + b - t
        g = 2.0 * np.sign(r) * np.maximum(0.0, np.abs(r) - eps)
        w -= lr * (w / n + C * (X.T @ g) / n)
        b -= lr * C * g.mean()
    acc = float((((X @ w + b) > 0) == y.astype(bool)).mean())
    return w, b, acc


def main() -> None:
    texts, idf = _corpus_texts()
    out: dict[str, np.ndarray] = {"idf": idf}
    accs = {}
    for lang in BANNER_TEMPLATES:
        rng = random.Random(SEED + sorted(BANNER_TEMPLATES).index(lang))
        pos = _banner_sentences(lang, rng, 300)
        neg = _negative_samples(texts, rng, 900, lang)
        X = np.stack([featurize(s, idf) for s in pos + neg])
        y = np.r_[np.ones(len(pos)), np.zeros(len(neg))]
        w, b, acc = _fit(X, y)
        out[f"w_{lang}"] = w
        out[f"b_{lang}"] = np.float64(b)
        accs[lang] = acc
    # cross-language fallback: train on the union
    rng = random.Random(SEED)
    pos, neg = [], []
    for lang in BANNER_TEMPLATES:
        pos += _banner_sentences(lang, rng, 100)
        neg += _negative_samples(texts, rng, 300)
    X = np.stack([featurize(s, idf) for s in pos + neg])
    y = np.r_[np.ones(len(pos)), np.zeros(len(neg))]
    w, b, acc = _fit(X, y)
    out["w_*"] = w
    out["b_*"] = np.float64(b)
    accs["*"] = acc

    dest = Path(__file__).resolve().parent.parent / "atra_ray" / "data" / "gdbr_weights.npz"
    np.savez_compressed(dest, **out)
    print({k: round(v, 4) for k, v in accs.items()}, "->", dest)


if __name__ == "__main__":
    main()
