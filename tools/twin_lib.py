"""Shared CPython twin helpers (dev-time only): Java char semantics, the
committed model artifacts' scoring loops, and java.util.Random — used by
gen_expected_pipeline.py to recompute the flagship pipeline independently.
"""
import math, re, struct, unicodedata

# ---- Java char semantics ---------------------------------------------------

def java_lower(c):
    lc = c.lower()
    return lc[0] if lc else c

def is_java_ws(c):
    if c in '\t\n\x0b\f\r\x1c\x1d\x1e\x1f':
        return True
    if c in '\xa0  ':
        return False
    return unicodedata.category(c) in ('Zs', 'Zl', 'Zp')

def is_letter(c):
    return unicodedata.category(c) in ('Lu', 'Ll', 'Lt', 'Lm', 'Lo')

def is_digit(c):
    return unicodedata.category(c) == 'Nd'

# Unicode Script ranges for the CJK check (Java Character.UnicodeScript of
# HAN/HIRAGANA/KATAKANA/HANGUL — ranges cover the generated corpus; note
# U+30FC prolonged-sound mark is Script=Common, intentionally NOT included)
_CJK_RANGES = (
    (0x3005, 0x3005), (0x3007, 0x3007), (0x3400, 0x4DBF), (0x4E00, 0x9FFF),
    (0xF900, 0xFAFF),                       # Han
    (0x3041, 0x3096), (0x309D, 0x309F),     # Hiragana
    (0x30A1, 0x30FA), (0x30FD, 0x30FF), (0x31F0, 0x31FF),  # Katakana
    (0x1100, 0x11FF), (0x3130, 0x318F), (0xAC00, 0xD7A3),  # Hangul
)

def is_cjk_script(c):
    o = ord(c)
    return any(a <= o <= b for a, b in _CJK_RANGES)

# ---- java.util.Random ------------------------------------------------------

_M48 = (1 << 48) - 1

class JavaRandom:
    def __init__(self, seed):
        self.seed = (seed ^ 0x5DEECE66D) & _M48

    def _next(self, bits):
        self.seed = (self.seed * 0x5DEECE66D + 0xB) & _M48
        return self.seed >> (48 - bits)

    def next_int(self, bound):
        if bound & (bound - 1) == 0:
            return (bound * self._next(31)) >> 31
        while True:
            bits = self._next(31)
            val = bits % bound
            if bits - val + (bound - 1) < (1 << 31):
                return val

    def next_long(self):
        hi = self._next(32)
        lo = self._next(32)
        hi = hi - (1 << 32) if hi >= (1 << 31) else hi
        lo = lo - (1 << 32) if lo >= (1 << 31) else lo
        v = (hi << 32) + lo
        v &= (1 << 64) - 1
        return v - (1 << 64) if v >= (1 << 63) else v

    def next_double(self):
        return ((self._next(26) << 27) + self._next(27)) / float(1 << 53)

def splitmix64(x0):
    x = (x0 + 0x9e3779b97f4a7c15) & ((1 << 64) - 1)
    x = ((x ^ (x >> 30)) * 0xbf58476d1ce4e5b9) & ((1 << 64) - 1)
    x = ((x ^ (x >> 27)) * 0x94d049bb133111eb) & ((1 << 64) - 1)
    return x ^ (x >> 31)

# ---- model artifact scoring (langid.bin / ppl_*.lm, ModelIo format) --------

def read_ppl(path):
    b = open(path, 'rb').read()
    a = struct.unpack('>i', b[:4])[0]
    return struct.unpack(f'>{a*a*a}f', b[4:])

def ppl_sym(c):
    lc = java_lower(c)
    o = ord(lc)
    if 97 <= o <= 122: return o - 97
    if 48 <= o <= 57: return 26 + (o - 48)
    return 36 if is_java_ws(lc) else 37

def perplexity(lp, text, A=38, max_ppl=1e6):
    lim = min(len(text), 8192)
    if lim == 0:
        return max_ppl
    c2 = c1 = 36
    s = 0.0
    for i in range(lim):
        c0 = ppl_sym(text[i])
        s += lp[(c2 * A + c1) * A + c0]
        c2, c1 = c1, c0
    return min(math.exp(-s / lim), max_ppl)

def read_langid(path):
    b = open(path, 'rb')
    nl = struct.unpack('>i', b.read(4))[0]
    langs = []
    for _ in range(nl):
        ln = struct.unpack('>i', b.read(4))[0]
        langs.append(b.read(ln).decode('utf-8'))
    ng = struct.unpack('>i', b.read(4))[0]
    keys = struct.unpack(f'>{ng}q', b.read(8 * ng))
    probs = struct.unpack(f'>{ng*nl}d', b.read(8 * ng * nl))
    dflt = struct.unpack(f'>{nl}d', b.read(8 * nl))
    return langs, {k: r for r, k in enumerate(keys)}, probs, dflt

def lid_normalize(text):
    out = [' ']
    last_space = True
    for ch in text[:4096]:
        c = java_lower(ch)
        if is_java_ws(c):
            if not last_space:
                out.append(' ')
                last_space = True
        else:
            out.append(c)
            last_space = False
    out.append(' ')
    return ''.join(out)

def classify(model, text):
    langs, keymap, probs, dflt = model
    t = lid_normalize(text)
    nl = len(langs)
    scores = [0.0] * nl
    n = 0
    L = len(t)
    for pos in range(L):
        for ln in (1, 2, 3):
            if pos + ln > L:
                break
            key = ln << 48
            for j in range(ln):
                key |= ord(t[pos + j]) << (j * 16)
            row = keymap.get(key, -1)
            if row >= 0:
                off = row * nl
                for i in range(nl):
                    scores[i] += probs[off + i]
            else:
                for i in range(nl):
                    scores[i] += dflt[i]
            n += 1
    if n == 0:
        return "und", 0.0
    best = 0
    for i in range(1, nl):
        if scores[i] > scores[best]:
            best = i
    mx = scores[best] / n
    z = 0.0
    for i in range(nl):
        z += math.exp(scores[i] / n - mx)
    return langs[best], 1.0 / z

# ---- Quality.metrics / Quality.decide twins (shared by both generators) ----
ASCII_WS = re.compile(r'[ \t\n\x0b\f\r]+')

def q_tokens(text):
    return [t for t in ASCII_WS.split(text.lower()) if t]

STOPWORDS = set("""the a an and or of to in is it on for with as at by be this
that from el la los las de que y en un una del se con por su para es al lo
como der die das und ist von den im mit sich des auf ein eine um am dem zu
nicht uber le les et dans est pour qui sur pas plus par avec son une ses aux
ce il du""".split())

def metrics(text):
    toks = q_tokens(text)
    n_w = len(toks)
    n_c = len(text)
    stop = sum(1 for t in toks if t in STOPWORDS)
    alpha_words = sum(1 for t in toks if any(is_letter(c) for c in t))
    sum_len = sum(len(t) for t in toks)
    max_len = max((len(t) for t in toks), default=0)
    symbols = letters = cjk = 0
    for c in text:
        if is_letter(c):
            letters += 1
            if is_cjk_script(c):
                cjk += 1
        elif not is_digit(c) and not is_java_ws(c):
            symbols += 1
    lines = text.split('\n')
    dup_lines = 1.0 - len(set(lines)) / len(lines)
    dup_words = 0.0 if n_w == 0 else 1.0 - len(set(toks)) / n_w
    return dict(
        nChars=n_c, nWords=n_w,
        meanWordLen=0.0 if n_w == 0 else sum_len / n_w,
        stopwordRatio=0.0 if n_w == 0 else stop / n_w,
        symbolRatio=0.0 if n_c == 0 else symbols / n_c,
        dupLineFrac=dup_lines, dupWordFrac=dup_words,
        alphaWordRatio=0.0 if n_w == 0 else alpha_words / n_w,
        maxWordLen=max_len, cjkRatio=0.0 if letters == 0 else cjk / letters)

def decide(m, ppl):
    cjk = m["cjkRatio"] > 0.3
    if m["nChars"] < 40: return False, "too_short"
    if m["nChars"] > 1000000: return False, "too_long"
    if not cjk and m["nWords"] < 5: return False, "too_few_words"
    if m["nWords"] > 200000: return False, "too_many_words"
    if not cjk and m["meanWordLen"] < 2.0: return False, "mean_word_len_low"
    if not cjk and m["meanWordLen"] > 14.0: return False, "mean_word_len_high"
    if not cjk and m["maxWordLen"] > 60: return False, "max_word_len"
    if m["symbolRatio"] > 0.10: return False, "symbol_ratio"
    if not cjk and m["stopwordRatio"] < 0.01: return False, "stopword_ratio"
    if not cjk and m["alphaWordRatio"] < 0.5: return False, "alpha_word_ratio"
    if m["dupLineFrac"] > 0.30: return False, "dup_lines"
    if m["dupWordFrac"] > 0.95: return False, "dup_words"
    if not cjk and ppl > 80.0: return False, "perplexity"
    return True, ""


# ---- TextDedup MinHash/shingle twins (MurmurHash3 ports; shared by
# gen_expected.py and gen_expected_pipeline.py) ----
M32 = 0xffffffff

def _rotl(x, r):
    return ((x << r) | (x >> (32 - r))) & M32

def _mix(h, k):
    k = (k * 0xcc9e2d51) & M32
    k = _rotl(k, 15)
    k = (k * 0x1b873593) & M32
    h ^= k
    h = _rotl(h, 13)
    return (h * 5 + 0xe6546b64) & M32

def _mix_last(h, k):
    k = (k * 0xcc9e2d51) & M32
    k = _rotl(k, 15)
    k = (k * 0x1b873593) & M32
    return h ^ k

def _fmix(h, length):
    h ^= length
    h ^= h >> 16
    h = (h * 0x85ebca6b) & M32
    h ^= h >> 13
    h = (h * 0xc2b2ae35) & M32
    h ^= h >> 16
    return h

def scala_string_hash(s, seed):
    h = seed & M32
    i = 0
    n = len(s)
    while i + 1 < n:
        h = _mix(h, ((ord(s[i]) << 16) + ord(s[i + 1])) & M32)
        i += 2
    if i < n:
        h = _mix_last(h, ord(s[i]))
    return _fmix(h, n)

def scala_array_hash(a, seed):
    h = seed & M32
    for v in a:
        h = _mix(h, v & M32)
    return _fmix(h, len(a))

def to_s32(x):
    x &= M32
    return x - (1 << 32) if x >= (1 << 31) else x

def to_s64(x):
    x &= (1 << 64) - 1
    return x - (1 << 64) if x >= (1 << 63) else x

def hash64(s):  # TextDedup.hash64: two seeded murmur32s
    h1 = to_s32(scala_string_hash(s, 0x9747b28c))
    h2 = scala_string_hash(s, 0x85ebca6b) & M32
    return ((h1 << 32) | h2) & ((1 << 64) - 1)

HASH_A = [splitmix64(i * 2 + 1) | 1 for i in range(256)]
HASH_B = [splitmix64(0x5151 + i) for i in range(256)]

WS_RE = re.compile(r'[ \t\n\x0b\f\r]+')  # java regex \s is ASCII-only

def tokens(text):  # Quality.tokens: String.toLowerCase + split("\s+")
    return [t for t in WS_RE.split(text.lower()) if t]

def shingles(text, k):
    t = tokens(text)
    if len(t) < k:
        return [' '.join(t)] if t else []
    return [' '.join(t[i:i + k]) for i in range(len(t) - k + 1)]

def min_hash(text, k, num):
    sig = [0x7fffffff] * num
    for s in shingles(text, k):
        h = hash64(s)
        for i in range(num):
            v = to_s32(((HASH_A[i] * h + HASH_B[i]) & ((1 << 64) - 1)) >> 32)
            if v < sig[i]:
                sig[i] = v
    return sig

def band_keys(sig, bands):
    rows = len(sig) // bands
    return [((b << 32) | (scala_array_hash(sig[b * rows:(b + 1) * rows], b)
             & M32)) for b in range(bands)]


# ---- QualityTrain twins (featurize / ridge solve / predict) -----------------
# Shared by gen_expected.py (train/apply goldens) and
# gen_expected_pipeline.py (q_quality_pipeline): ONE copy of the op-exact
# quantization and the partial-pivot elimination, so the two generators
# cannot drift. Doubles are IEEE-deterministic given identical op order,
# matching the JVM solve bit-for-bit.
import math as _math

QT_NF = 12
QT_NG = 16
QT_NAMES = ["bias", "chars", "words", "mean_wlen", "stop", "sym", "dup_line",
            "dup_word", "alpha", "max_wlen", "cjk", "ppl"]

def qt_featurize(text, ppl):
    m = metrics(text)
    y = 1 if decide(m, ppl)[0] else 0
    f = [1000,
         min(m["nChars"], 100000) // 100,
         min(m["nWords"], 20000) // 20,
         min(_math.floor(m["meanWordLen"] * 50.0), 1000),
         _math.floor(m["stopwordRatio"] * 1000.0),
         _math.floor(m["symbolRatio"] * 1000.0),
         _math.floor(m["dupLineFrac"] * 1000.0),
         _math.floor(m["dupWordFrac"] * 1000.0),
         _math.floor(m["alphaWordRatio"] * 1000.0),
         min(m["maxWordLen"], 1000),
         _math.floor(m["cjkRatio"] * 1000.0),
         min(_math.floor(ppl), 1000)]
    return f, y

def qt_featurize_ng(text, ppl):
    f, y = qt_featurize(text, ppl)
    toks = tokens(text)
    cnt = [0] * QT_NG
    for tk in toks:
        cnt[hash64(tk) % QT_NG] += 1
    if toks:
        f = f + [1000 * c // len(toks) for c in cnt]
    else:
        f = f + [0] * QT_NG
    return f, y

def qt_ridge_solve(feats, nf, drop_cw=5, ridge=1.0):
    """Exact-integer normal equations + the SAME partial-pivot elimination
    op order as QualityTrain.trainGeneric/solveInPlace."""
    A = [[0] * nf for _ in range(nf)]
    b = [0] * nf
    for f, y in feats:
        ty = 2 * y - 1
        cw = 1 if y == 1 else drop_cw
        for j in range(nf):
            b[j] += cw * f[j] * ty
            for k in range(j, nf):
                A[j][k] += cw * f[j] * f[k]
    M = [[float(A[j][k] if k >= j else A[k][j]) / 1.0e6
          for k in range(nf)] for j in range(nf)]
    for j in range(nf):
        M[j][j] = M[j][j] + ridge
    v = [float(b[j]) / 1.0e3 for j in range(nf)]
    for col in range(nf):
        piv = col
        for r in range(col + 1, nf):
            if abs(M[r][col]) > abs(M[piv][col]):
                piv = r
        M[col], M[piv] = M[piv], M[col]
        v[col], v[piv] = v[piv], v[col]
        d = M[col][col]
        for r in range(col + 1, nf):
            fac = M[r][col] / d
            for k in range(col, nf):
                M[r][k] = M[r][k] - fac * M[col][k]
            v[r] = v[r] - fac * v[col]
    w = [0.0] * nf
    for r in range(nf - 1, -1, -1):
        s = v[r]
        for k in range(r + 1, nf):
            s = s - M[r][k] * w[k]
        w[r] = s / M[r][r]
    return w

def qt_predict_keep(w, f):
    z = 0.0
    for j in range(len(w)):
        z += w[j] * f[j]
    return z >= 0.0
