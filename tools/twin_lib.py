"""Shared CPython twin helpers (dev-time only): Java char semantics, the
committed model artifacts' scoring loops, and java.util.Random — used by
gen_expected_pipeline.py to recompute the flagship pipeline independently.
"""
import math, struct, unicodedata

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
