"""Linear quality model trained offline by tools/train_quality.py — do not
hand-edit. repr() round-trips doubles exactly, so the Spark expressions and the
DuckDB SQL literals parse to bit-identical float64 values. Trained on the
sf slice + planted low-quality docs (mixed labels); holdout scored below."""

TRAINED_ON = 'sf0.01'
N_TRAIN = 571
N_HOLDOUT = 209
N_PLANTED = 280
LABEL_POS_RATE = 0.6392294220665499
HOLDOUT_POS_RATE = 0.6076555023923444
TRAIN_ACCURACY = 0.9859894921190894
HOLDOUT_ACCURACY = 1.0
FEATURES = ['log_tokens', 'mean_word_len', 'distinct_ratio', 'top_unigram_share', 'alpha_word_ratio', 'symbol_ratio', 'stopword_ratio']
WEIGHTS = {
    'log_tokens': 1.0828339211367457,
    'mean_word_len': -3.336225616404868,
    'distinct_ratio': 8.52525287752923,
    'top_unigram_share': -5.033113802301116,
    'alpha_word_ratio': 10.432452741051868,
    'symbol_ratio': -3.857536932643761,
    'stopword_ratio': 1.11539161697895,
}
BIAS = -0.6259691325187025
