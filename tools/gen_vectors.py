#!/usr/bin/env python3
"""Golden-vector generator (dev-time only; output is committed).

Re-states the reference's code-defined semantics (regex patterns from
/root/reference/app/detectors.py:22-25 and app/security_manager.py:182-191,
single-pass union replace from app/main.py:100-131, HMAC seed from
app/alias.py:4-7, alias formats from app/alias.py:10-19) and dumps their
behavior on a fixed battery as JSON for the Scala parity tests.

The shipped Scala library never runs Python; this exists so `sbt test` can
assert byte-identical behavior against CPython `re` / `random` / `hmac`.
"""
import re, json, hmac, hashlib, base64, random, sys

# --- patterns exactly as the reference source defines them ---------------
RE_EMAIL  = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
RE_PHONE  = re.compile(r"(?:0\d{1,4}-\d{1,4}-\d{3,4})|(?:\+81-\d{1,4}-\d{1,4}-\d{3,4})")
RE_AMOUNT = re.compile(r"(?:¥|JPY)?\s?\d{1,3}(?:,\d{3})+")
RE_ID     = re.compile(r"\b(?:ACC|USR|ORD)-\d{4,6}\b")
RE_POSTAL = re.compile(r'(?:〒\s*)?(?<!\d)\d{3}[ -‐−–—－]?\d{4}(?![-\d])')
SEP = r'[-．.・ー—－]'
RE_ADDRESS = re.compile(rf'[一-龠]{{1,10}}[都道府県][一-龠]{{1,15}}[市区町村][一-龠0-9{SEP}\s]{{0,40}}')
RE_NAME_K  = re.compile(r'[一-龠]{2,4}\s*[一-龠]{1,3}(?:さん|様|氏|先生|君|ちゃん)?')
RE_NAME_H  = re.compile(r'[ぁ-ゔ]{3,8}(?:さん|様|氏|先生|君|ちゃん)?')
RE_NAME_T  = re.compile(r'[ァ-ヶ]{3,8}(?:さん|様|氏|先生|君|ちゃん)?')

PATTERNS = {
    "email": RE_EMAIL, "phone": RE_PHONE, "amount": RE_AMOUNT, "id": RE_ID,
    "postal": RE_POSTAL, "address": RE_ADDRESS,
    "name_kanji": RE_NAME_K, "name_hiragana": RE_NAME_H, "name_katakana": RE_NAME_T,
}

BATTERY = [
    "taro.yamada+dev@example.co.jp",
    "contact: a@b.io and c.d_e%f@sub.domain.org done",
    "03-1234-5678",
    "0120-12-345 office",
    "+81-3-1234-5678",
    "call +81-90-1234-5678 or 03-1111-2222 now",
    "¥1,234,567",
    "JPY 12,000",
    "price 1,234 yen",
    " 1,234",
    "x 12,345,678 y",
    "ACC-12345 USR-9999 ORD-123456",
    "xACC-12345 ACC-123 ACC-1234567",
    "〒123-4567",
    "123 4567",
    "123-4567",
    "123X4567",
    "0123-4567",
    "123-45678",
    "１２３-４５６７",
    "〒 567 8901 Osaka",
    "東京都新宿区西新宿2-8-1",
    "東京都新宿区西 新宿",
    "大阪府大阪市北区梅田1丁目",
    "東京都新宿区a b]]]",
    "北海道札幌市 中央区",
    "山田太郎さん",
    "田中 花子様",
    "やまだたろう氏",
    "タナカハナコ",
    "すずきいちろう先生と ヤマモト君",
    "佐藤 健",
    "mail taro@ex.jp tel 03-9999-8888 pay ¥5,000 id USR-12345",
    "a@b.cc03-1234-5678",
    "ACC-1234503-1111-2222",
    "JPY 1,000 and ¥2,000 and 3,000",
    "nested test@ex.com¥1,234ACC-9999x",
    "line one 03-1234-5678\nline two a@b.org\n¥9,999,999",
    "full width　space１,２３４ test",
    "edge-@x.yz a@-b.cc a@b.c",
    "045-123-4567は03-1234-5678",
    "0-1234-567",
    "phones: 00-1-111, 09999-9999-9999",
    "email+tag@example.museum.",
    "ＡＣＣ-12345 acc-12345",
    "",
    "no pii here at all just words",
]

def spans(rx, s):
    return [[m.start(), m.end(), m.group()] for m in rx.finditer(s)]

def classify_by_regex(text):  # app/detectors.py:28-34
    out = []
    for m in RE_EMAIL.finditer(text):  out.append({"kind":"email","text":m.group(),"start":m.start(),"end":m.end(),"conf":0.99,"reason":"regex:email"})
    for m in RE_PHONE.finditer(text):  out.append({"kind":"phone","text":m.group(),"start":m.start(),"end":m.end(),"conf":0.95,"reason":"regex:phone"})
    for m in RE_AMOUNT.finditer(text): out.append({"kind":"amount","text":m.group(),"start":m.start(),"end":m.end(),"conf":0.90,"reason":"regex:amount"})
    for m in RE_ID.finditer(text):     out.append({"kind":"id","text":m.group(),"start":m.start(),"end":m.end(),"conf":0.88,"reason":"regex:id"})
    return out

def rule_ner(text):  # app/security_manager.py:177-212 (single text)
    out = []
    for m in RE_POSTAL.finditer(text):
        out.append({"kind":"address","text":m.group(),"start":m.start(),"end":m.end(),"conf":0.85,"reason":"offline_rule_postal"})
    for m in RE_ADDRESS.finditer(text):
        out.append({"kind":"address","text":m.group(),"start":m.start(),"end":m.end(),"conf":0.80,"reason":"offline_rule_address"})
    for rx in (RE_NAME_K, RE_NAME_H, RE_NAME_T):
        for m in rx.finditer(text):
            out.append({"kind":"name","text":m.group(),"start":m.start(),"end":m.end(),"conf":0.75,"reason":"offline_rule_name"})
    return out

ORDERED = [("email", RE_EMAIL), ("phone", RE_PHONE), ("amount", RE_AMOUNT), ("id", RE_ID)]

def union_replace_tag(text, policies):  # app/main.py:100-131 with tag aliases
    pats = [(k, p) for k, p in ORDERED if k in policies]
    if not pats: return text
    union = re.compile("|".join(f"({p.pattern})" for _, p in pats))
    def repl(m):
        idx = next(i for i, g in enumerate(m.groups(), start=1) if g is not None)
        kind, _ = pats[idx-1]
        return f"<{kind.upper()}>"
    return union.sub(repl, text)

# --- HMAC seed + Mersenne-Twister alias formats (app/alias.py) ------------
def seed_of(key_b64, ns, kind, orig):
    key = base64.b64decode(key_b64)
    dig = hmac.new(key, f"{ns}|{kind}|{orig}".encode(), hashlib.sha256).digest()
    return int.from_bytes(dig[:8], "big")

def alias_value_nofaker(kind, orig, key_b64, ns):
    # phone/amount/id branches of app/alias.py:10-19 use only random.Random;
    # the Faker instance is constructed but never drawn from for these kinds.
    s = seed_of(key_b64, ns, kind, orig)
    rnd = random.Random(s)
    if kind == "phone":  return f"0{rnd.randint(1,9)}-{rnd.randint(1000,9999)}-{rnd.randint(1000,9999)}"
    if kind == "amount": return f"¥{rnd.randint(1,9)},{rnd.randint(0,999):03},{rnd.randint(0,999):03}"
    if kind == "id":     return f"{rnd.choice(['USR','ORD','ACC'])}-{rnd.randint(10000,99999)}"
    raise ValueError(kind)

KEY = base64.b64encode(b"graft-spark-pii-default-key!").decode()
NS = "tenant-a"

def union_replace_ref(text, policies):  # reference semantics, phone/amount/id only
    pats = [(k, p) for k, p in ORDERED if k in policies]
    if not pats: return text
    union = re.compile("|".join(f"({p.pattern})" for _, p in pats))
    def repl(m):
        idx = next(i for i, g in enumerate(m.groups(), start=1) if g is not None)
        kind, _ = pats[idx-1]
        orig = m.group(0)
        if kind == "amount":  # app/main.py:126-127 JPY reformat branch
            new = alias_value_nofaker("amount", orig, KEY, NS)
            return f"JPY {new.lstrip('¥').strip()}" if "JPY" in orig else new
        return alias_value_nofaker(kind, orig, KEY, NS)
    return union.sub(repl, text)

out = {
    "battery": BATTERY,
    "spans": {name: [spans(rx, s) for s in BATTERY] for name, rx in PATTERNS.items()},
    "classify": [classify_by_regex(s) for s in BATTERY],
    "ner": [rule_ner(s) for s in BATTERY],
    "union_tag_all": [union_replace_tag(s, {"email","phone","amount","id"}) for s in BATTERY],
    "union_tag_email_id": [union_replace_tag(s, {"email","id"}) for s in BATTERY],
    "union_tag_phone": [union_replace_tag(s, {"phone"}) for s in BATTERY],
    "key_b64": KEY, "ns": NS,
    "seeds": [
        {"ns": NS, "kind": k, "orig": o, "seed": str(seed_of(KEY, NS, k, o))}
        for k, o in [("email","a@b.com"),("phone","03-1234-5678"),("amount","¥1,234"),
                     ("id","ACC-12345"),("name","山田太郎"),("address","〒123-4567"),
                     ("phone",""),("amount","JPY 12,000")]
    ],
    "mt_vectors": [
        {"seed": str(s),
         "randint_1_9": random.Random(s).randint(1,9),
         "seq": [random.Random(s).randint(1,9)] +
                (lambda r: [r.randint(1000,9999), r.randint(0,999), r.randint(10000,99999),
                            r.choice([0,1,2]), r.getrandbits(32), r.getrandbits(32)])(random.Random(s))[1:] if False else None,
        } for s in []
    ],
    "ref_alias": {
        "phone": {o: alias_value_nofaker("phone", o, KEY, NS) for o in ["03-1234-5678","+81-3-1234-5678","0120-12-345"]},
        "amount": {o: alias_value_nofaker("amount", o, KEY, NS) for o in ["¥1,234,567","JPY 12,000","1,234"]},
        "id": {o: alias_value_nofaker("id", o, KEY, NS) for o in ["ACC-12345","USR-9999","ORD-123456"]},
    },
    "union_ref_all": [union_replace_ref(s, {"phone","amount","id"}) for s in BATTERY],
}

# plain MT draw vectors for the PyRandom port
mtv = []
for s in [0, 1, 42, 2**31, 2**31-1, 2**63-1, 2**64-1,
          seed_of(KEY, NS, "phone", "03-1234-5678"),
          seed_of(KEY, NS, "id", "ACC-12345")]:
    r = random.Random(s)
    mtv.append({"seed": str(s),
                "draws": [r.randint(1,9), r.randint(1000,9999), r.randint(0,999),
                          r.randint(10000,99999), r.choice([10,20,30]),
                          r.getrandbits(32), r.getrandbits(32), r.getrandbits(8)]})
out["mt_vectors"] = mtv

path = sys.argv[1] if len(sys.argv) > 1 else "src/test/resources/golden/ref_vectors.json"
with open(path, "w") as f:
    json.dump(out, f, ensure_ascii=False, indent=1)
print("wrote", path)
