"""Linear quality model trained offline by tools/train_quality.py — do not
hand-edit. repr() round-trips doubles exactly, so the Spark expressions and the
DuckDB SQL literals parse to bit-identical float64 values."""

TRAINED_ON = 'sf0.01'
N_TRAIN = 500
LABEL_POS_RATE = 0.984
TRAIN_ACCURACY = 0.984
FEATURES = ['log_tokens', 'mean_word_len', 'distinct_ratio', 'top_unigram_share', 'alpha_word_ratio', 'symbol_ratio', 'stopword_ratio']
WEIGHTS = {
    'log_tokens': -0.915238603444712,
    'mean_word_len': 1.4854154895845355,
    'distinct_ratio': 0.8771594439674815,
    'top_unigram_share': 0.10286235611207102,
    'alpha_word_ratio': 0.34476649453859354,
    'symbol_ratio': 0.0,
    'stopword_ratio': -0.10840556037444954,
}
BIAS = 0.34476649453859354
