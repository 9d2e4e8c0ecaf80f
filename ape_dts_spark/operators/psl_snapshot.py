"""Public-suffix list snapshot — the lookup behind `registered_domain`.

A web-scale pipeline groups, salts, and rate-limits by *registered domain*
(the unit a single operator controls), and a bare "last two labels"
heuristic mis-groups every ccTLD with second-level registries: `foo.co.uk`
and `bar.co.uk` collapse under `co.uk` — one phantom mega-domain that then
drives hot-domain salting and per-domain caps for the whole .uk crawl.

This module is a DETERMINISTIC SNAPSHOT SUBSET of the publicly documented
suffix rules at publicsuffix.org (ICANN section), checked in as data so:

* both engines (Spark and the DuckDB oracle) evaluate the *same* table —
  the oracle SQL embeds the identical literals (see
  `url_tools.registered_domain_sql`);
* results are reproducible across runs/clusters (no network fetch, no
  version drift mid-job).

Scope (documented, deliberate):

* plain 2-label and 3-label rules, plus TLD-level wildcard rules (`*.ck`:
  any single label under the TLD is itself a public suffix, so the
  registered domain is the last THREE labels) and their 2-label exception
  rules (`!www.ck`: carved back out of the wildcard, registrable as-is).
  Deeper wildcards (`*.kawasaki.jp` style) are NOT modeled; hosts under
  those degrade to the 2-label default.
* the snapshot covers the high-traffic ccTLD registries (uk/au/nz/jp/br/
  cn/in/za/kr/... plus US state suffixes); an unlisted suffix degrades to
  the 2-label default — the same answer the pre-PSL heuristic gave, never
  worse.

Swapping in a fuller snapshot is a data-only change (extend the tuples);
at cluster scale the membership test compiles to a single codegen IN over
a few hundred literals — no join, no broadcast, no UDF.
"""

from __future__ import annotations

#: 2-label public suffixes: a host's registered domain is its last THREE
#: labels when the last two match one of these.
PSL_2LABEL: tuple[str, ...] = (
    # .uk
    "ac.uk", "co.uk", "gov.uk", "ltd.uk", "me.uk", "net.uk", "nhs.uk",
    "org.uk", "plc.uk", "police.uk", "sch.uk",
    # .au
    "asn.au", "com.au", "edu.au", "gov.au", "id.au", "net.au", "org.au",
    # .nz
    "ac.nz", "co.nz", "geek.nz", "gen.nz", "govt.nz", "kiwi.nz",
    "maori.nz", "net.nz", "org.nz", "school.nz",
    # .jp
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "ne.jp", "or.jp",
    # .br
    "art.br", "blog.br", "com.br", "edu.br", "gov.br", "net.br", "org.br",
    # .cn
    "ac.cn", "com.cn", "edu.cn", "gov.cn", "net.cn", "org.cn",
    # .in
    "ac.in", "co.in", "edu.in", "firm.in", "gen.in", "gov.in", "ind.in",
    "mil.in", "net.in", "nic.in", "org.in", "res.in",
    # .za
    "ac.za", "co.za", "gov.za", "net.za", "org.za", "web.za",
    # .kr
    "ac.kr", "co.kr", "es.kr", "go.kr", "hs.kr", "kg.kr", "mil.kr",
    "ms.kr", "ne.kr", "or.kr", "pe.kr", "re.kr", "sc.kr",
    # .mx
    "com.mx", "edu.mx", "gob.mx", "net.mx", "org.mx",
    # .ar
    "com.ar", "edu.ar", "gob.ar", "int.ar", "mil.ar", "net.ar", "org.ar",
    "tur.ar",
    # .tr
    "av.tr", "bbs.tr", "bel.tr", "com.tr", "edu.tr", "gov.tr", "net.tr",
    "org.tr",
    # .sg / .my / .hk / .tw
    "com.sg", "edu.sg", "gov.sg", "net.sg", "org.sg", "per.sg",
    "com.my", "edu.my", "gov.my", "net.my", "org.my",
    "com.hk", "edu.hk", "gov.hk", "idv.hk", "net.hk", "org.hk",
    "com.tw", "edu.tw", "gov.tw", "idv.tw", "net.tw", "org.tw",
    # .id
    "ac.id", "biz.id", "co.id", "desa.id", "go.id", "mil.id", "my.id",
    "net.id", "or.id", "sch.id", "web.id",
    # .ph / .vn
    "com.ph", "edu.ph", "gov.ph", "net.ph", "org.ph",
    "ac.vn", "biz.vn", "com.vn", "edu.vn", "gov.vn", "info.vn", "int.vn",
    "name.vn", "net.vn", "org.vn", "pro.vn",
    # .eg / .sa / .il / .th
    "com.eg", "edu.eg", "eun.eg", "gov.eg", "mil.eg", "name.eg", "net.eg",
    "org.eg", "sci.eg",
    "com.sa", "edu.sa", "gov.sa", "med.sa", "net.sa", "org.sa", "pub.sa",
    "sch.sa",
    "ac.il", "co.il", "gov.il", "idf.il", "muni.il", "net.il", "org.il",
    "ac.th", "co.th", "go.th", "in.th", "mi.th", "net.th", "or.th",
    # .ua / .pl
    "com.ua", "edu.ua", "gov.ua", "in.ua", "kiev.ua", "net.ua", "org.ua",
    "biz.pl", "com.pl", "edu.pl", "gov.pl", "info.pl", "net.pl", "org.pl",
    "waw.pl",
    # .ng / .ke / .pk / .bd
    "com.ng", "edu.ng", "gov.ng", "i.ng", "net.ng", "org.ng", "sch.ng",
    "ac.ke", "co.ke", "go.ke", "info.ke", "me.ke", "mobi.ke", "ne.ke",
    "or.ke", "sc.ke",
    "biz.pk", "com.pk", "edu.pk", "fam.pk", "gob.pk", "gok.pk", "gov.pk",
    "net.pk", "org.pk", "web.pk",
    "ac.bd", "com.bd", "edu.bd", "gov.bd", "mil.bd", "net.bd", "org.bd",
    # Latin America
    "com.co", "edu.co", "gov.co", "mil.co", "net.co", "nom.co", "org.co",
    "com.pe", "edu.pe", "gob.pe", "mil.pe", "net.pe", "nom.pe", "org.pe",
    "com.ve", "edu.ve", "gob.ve", "info.ve", "mil.ve", "net.ve", "org.ve",
    "web.ve",
    "com.uy", "edu.uy", "gub.uy", "mil.uy", "net.uy", "org.uy",
    "ac.cr", "co.cr", "ed.cr", "fi.cr", "go.cr", "or.cr", "sa.cr",
    "art.do", "com.do", "edu.do", "gob.do", "mil.do", "net.do", "org.do",
    "sld.do", "web.do",
    "com.gt", "edu.gt", "gob.gt", "ind.gt", "mil.gt", "net.gt", "org.gt",
    "com.ec", "edu.ec", "fin.ec", "gob.ec", "gov.ec", "info.ec", "k12.ec",
    "med.ec", "mil.ec", "net.ec", "org.ec", "pro.ec",
    "com.bo", "edu.bo", "gob.bo", "int.bo", "mil.bo", "net.bo", "org.bo",
    "tv.bo", "web.bo",
    "com.py", "coop.py", "edu.py", "gov.py", "mil.py", "net.py", "org.py",
    # Middle East / Asia misc
    "com.lb", "edu.lb", "gov.lb", "net.lb", "org.lb",
    "com.jo", "edu.jo", "gov.jo", "mil.jo", "name.jo", "net.jo", "org.jo",
    "sch.jo",
    "com.kw", "edu.kw", "emb.kw", "gov.kw", "ind.kw", "net.kw", "org.kw",
    "com.qa", "edu.qa", "gov.qa", "mil.qa", "name.qa", "net.qa", "org.qa",
    "sch.qa",
    "co.om", "com.om", "edu.om", "gov.om", "med.om", "museum.om", "net.om",
    "org.om", "pro.om",
    "com.bh", "edu.bh", "gov.bh", "net.bh", "org.bh",
    "ac.lk", "assn.lk", "com.lk", "edu.lk", "gov.lk", "grp.lk", "hotel.lk",
    "int.lk", "ltd.lk", "net.lk", "ngo.lk", "org.lk", "sch.lk", "soc.lk",
    "web.lk",
    "aero.np", "asia.np", "biz.np", "com.np", "coop.np", "edu.np",
    "gov.np", "info.np", "mil.np", "museum.np", "name.np", "net.np",
    "org.np", "pro.np",
    "com.kh", "edu.kh", "gov.kh", "mil.kh", "net.kh", "org.kh", "per.kh",
    "com.mm", "edu.mm", "gov.mm", "net.mm", "org.mm",
    "com.gh", "edu.gh", "gov.gh", "mil.gh", "org.gh",
    "co.zw", "gov.zw", "org.zw",
    # US state second-level registries (snapshot subset)
    "ca.us", "fl.us", "il.us", "ma.us", "mi.us", "ny.us", "oh.us",
    "pa.us", "tx.us", "wa.us",
)

#: TLD-level wildcard rules (`*.<tld>` in the PSL): EVERY single label under
#: the TLD is a public suffix, so the registered domain is the last THREE
#: labels (and a bare 2-label host under them has no registrable domain).
PSL_WILDCARD_TLD: tuple[str, ...] = ("ck", "er", "fk")

#: exception rules (`!` in the PSL): carved back OUT of a wildcard — the
#: named 2-label host IS registrable as-is (and is the registered domain of
#: everything below it).
PSL_EXCEPTION_2LABEL: tuple[str, ...] = ("www.ck",)

#: 3-label public suffixes: registered domain = last FOUR labels.
PSL_3LABEL: tuple[str, ...] = (
    # Australian state education registries
    "act.edu.au", "nsw.edu.au", "nt.edu.au", "qld.edu.au", "sa.edu.au",
    "tas.edu.au", "vic.edu.au", "wa.edu.au",
    # US state K-12 / library / community-college registries (subset)
    "cc.ca.us", "k12.ca.us", "k12.ny.us", "k12.tx.us", "lib.ca.us",
    "lib.ny.us",
)
