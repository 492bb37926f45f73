"""Multinomial Naive Bayes: learns a separable vocabulary split, and the
confusion matrix matches a pure-python mirror exactly."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from imposm3_spark.datapipe.nb import nb_train_eval


def _corpus():
    rows = []
    # two classes with distinct (but overlapping) vocabularies
    for i in range(40):
        lang = "en" if i % 2 == 0 else "es"
        if lang == "en":
            text = "the cat sat on the mat " + ("dog " * (i % 3))
        else:
            text = "el gato come pescado " + ("perro " * (i % 3))
        rows.append((i, text.strip(), lang, "s", len(text)))
    return rows


def _ref_confusion(rows, test_mod=5):
    train = [(i, t.split(), l) for i, t, l, _, _ in rows if i % test_mod != 0]
    test = [(i, t.split(), l) for i, t, l, _, _ in rows if i % test_mod == 0]
    tc = defaultdict(Counter)
    priors = Counter()
    for _, toks, l in train:
        priors[l] += 1
        tc[l].update(toks)
    n_train = sum(priors.values())
    vocab = len({t for c in tc.values() for t in c})
    totals = {c: sum(cnt.values()) for c, cnt in tc.items()}
    confusion = Counter()
    for _, toks, label in test:
        cnts = Counter(toks)
        n_d = sum(cnts.values())
        best = None
        for c in sorted(priors):
            score = math.log(priors[c] / n_train) - n_d * math.log(
                totals[c] + vocab
            )
            for t in sorted(cnts):
                if tc[c][t] > 0:
                    score += cnts[t] * math.log(tc[c][t] + 1)
            key = (-score, c)
            if best is None or key < best:
                best = key
                pred = c
        confusion[(label, pred)] += 1
    return dict(confusion)


def test_nb_matches_reference_and_separates(spark):
    rows = _corpus()
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {
        (r.label, r.predicted): r.n for r in nb_train_eval(df).collect()
    }
    assert got == _ref_confusion(rows)
    # fully separable vocabularies -> diagonal confusion
    assert all(label == pred for (label, pred) in got)
