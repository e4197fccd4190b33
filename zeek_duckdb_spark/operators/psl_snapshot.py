"""Vendored PARTIAL snapshot of the Public Suffix List (PSL).

The PSL (https://publicsuffix.org/list/ — Mozilla-maintained public
data, MPL-2.0) is the canonical answer to "what is the registrable
domain of this host": ``sub.example.co.uk`` registers under
``example.co.uk``, not ``co.uk``.  This module vendors the subset of
rules that actually CHANGES behavior relative to the naive
last-two-labels fallback — multi-label public suffixes (``co.uk``),
wildcard rules (``*.ck``) and their exceptions (``!www.ck``) — for
the most common ccTLD registries plus a few high-traffic private
registries.  Single-label TLDs (``com``, ``org``, …) are deliberately
omitted: the PSL default rule ``*`` already yields the same
registrable domain for them as the naive rule.

This is a SNAPSHOT, not the live list: pass ``psl='/path/to/
public_suffix_list.dat'`` (the upstream file parses directly) to any
PSL-accepting operator for full coverage.  Rule syntax is the
upstream's: one rule per line, ``//`` comments, ``*.`` wildcard
labels, ``!`` exception prefix.

Refresh recipe: download https://publicsuffix.org/list/public_suffix_list.dat,
keep every multi-label / wildcard / exception rule you care about
verbatim (the syntax here IS the upstream syntax — a rule line copies
unchanged into this tuple), and rerun
``pytest tests/test_textops.py -k psl_snapshot`` — the guard test
re-parses the snapshot through the upstream-file grammar and rejects
any rule that would not round-trip (stray whitespace, uppercase,
orphan exceptions, leading dots).
"""

PSL_SNAPSHOT: tuple[str, ...] = (
    # ---- ICANN section (registry-controlled, multi-label) ----
    # .uk
    "co.uk", "org.uk", "me.uk", "ltd.uk", "plc.uk", "net.uk", "sch.uk",
    "ac.uk", "gov.uk", "nhs.uk", "police.uk",
    # .au
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    # .jp (plus the geographic wildcard/exception pairs — the PSL's
    # canonical exception-rule exercisers)
    "co.jp", "or.jp", "ne.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp",
    "gr.jp", "lg.jp",
    "*.kawasaki.jp", "!city.kawasaki.jp",
    "*.kitakyushu.jp", "!city.kitakyushu.jp",
    "*.kobe.jp", "!city.kobe.jp",
    "*.nagoya.jp", "!city.nagoya.jp",
    "*.sapporo.jp", "!city.sapporo.jp",
    "*.sendai.jp", "!city.sendai.jp",
    "*.yokohama.jp", "!city.yokohama.jp",
    # .nz
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "geek.nz", "gen.nz", "kiwi.nz", "maori.nz", "iwi.nz", "mil.nz",
    # .za
    "co.za", "net.za", "org.za", "gov.za", "ac.za", "web.za", "edu.za",
    # .br
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br",
    "art.br", "blog.br", "eco.br", "esp.br", "far.br", "flog.br",
    # .in
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "nic.in", "ac.in", "edu.in", "res.in", "gov.in", "mil.in",
    # .cn
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn", "mil.cn",
    # .kr
    "co.kr", "ne.kr", "or.kr", "re.kr", "pe.kr", "go.kr", "mil.kr",
    "ac.kr", "hs.kr", "ms.kr", "es.kr", "sc.kr", "kg.kr",
    "seoul.kr", "busan.kr",
    # .tw
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "mil.tw",
    "idv.tw", "game.tw", "ebiz.tw", "club.tw",
    # .hk
    "com.hk", "net.hk", "org.hk", "gov.hk", "edu.hk", "idv.hk",
    # .sg
    "com.sg", "net.sg", "org.sg", "gov.sg", "edu.sg", "per.sg",
    # .il
    "co.il", "net.il", "org.il", "ac.il", "gov.il", "muni.il",
    "idf.il", "k12.il",
    # .tr
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "mil.tr",
    "k12.tr", "av.tr", "bel.tr", "biz.tr", "dr.tr", "gen.tr",
    "info.tr", "name.tr", "tel.tr", "tv.tr", "web.tr",
    # .ar
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar", "int.ar",
    "mil.ar", "tur.ar",
    # .mx
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    # .ua
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    "kiev.ua", "kyiv.ua",
    # .pl
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "info.pl",
    "waw.pl", "wroc.pl", "krakow.pl",
    # .id
    "co.id", "net.id", "or.id", "web.id", "sch.id", "ac.id", "go.id",
    "mil.id", "biz.id", "my.id", "desa.id", "ponpes.id",
    # .th
    "co.th", "net.th", "or.th", "ac.th", "go.th", "in.th", "mi.th",
    # .my
    "com.my", "net.my", "org.my", "gov.my", "edu.my", "mil.my",
    "name.my",
    # .ph
    "com.ph", "net.ph", "org.ph", "gov.ph", "edu.ph", "ngo.ph",
    "mil.ph", "i.ph",
    # .vn
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "int.vn",
    "ac.vn", "biz.vn", "info.vn", "name.vn", "pro.vn", "health.vn",
    # .co (Colombia)
    "com.co", "net.co", "org.co", "edu.co", "gov.co", "mil.co",
    "nom.co",
    # .eg / .sa / .ae
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg", "sci.eg",
    "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa", "med.sa",
    "pub.sa", "sch.sa",
    "co.ae", "net.ae", "org.ae", "ac.ae", "gov.ae", "mil.ae", "sch.ae",
    # .ke / .ng / .gh / .tz / .ug
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke", "info.ke",
    "me.ke", "mobi.ke",
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng", "name.ng",
    "sch.ng", "mil.ng", "mobi.ng", "i.ng",
    "com.gh", "org.gh", "gov.gh", "edu.gh", "mil.gh",
    "co.tz", "or.tz", "ne.tz", "go.tz", "ac.tz", "sc.tz", "info.tz",
    "me.tz", "mil.tz", "mobi.tz", "tv.tz",
    "co.ug", "or.ug", "ne.ug", "go.ug", "ac.ug", "sc.ug",
    # .us (state-code second levels are public suffixes; partial)
    "ca.us", "ny.us", "tx.us", "fl.us", "wa.us", "ma.us", "il.us",
    "k12.ca.us", "k12.ny.us", "k12.tx.us",
    # .ck — the PSL's canonical wildcard + exception pair
    "*.ck", "!www.ck",
    # ---- Private section (platform registries; partial) ----
    "github.io", "gitlab.io", "blogspot.com", "appspot.com",
    "herokuapp.com", "cloudfront.net", "azurewebsites.net",
    "netlify.app", "vercel.app", "web.app", "firebaseapp.com",
    "pages.dev", "workers.dev", "wordpress.com", "readthedocs.io",
    "neocities.org", "surge.sh", "onrender.com", "s3.amazonaws.com",
)
