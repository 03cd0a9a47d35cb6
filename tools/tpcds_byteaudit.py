#!/usr/bin/env python3
"""Byte-identity audit of the embedded verbatim benchmark texts: every
`private val qN` in TpcdsVerbatim*Queries.scala must equal the reference
TPC-DS kit's query file minus the `-- start/end query` marker lines and
leading/trailing blank lines, and every `private val qN` in
TpchVerbatimQueries.scala must equal the reference's modified TPC-H text
(test-scripts/test-data/tpch/modified-query) minus leading/trailing blank
lines. Exit 1 on any mismatch."""
import re, sys

KIT = '/root/reference/flink-end-to-end-tests/flink-tpcds-test/tpcds-tool/query'
SRC = ['/root/repo/src/main/scala/graft/coverage/TpcdsVerbatimQueries.scala',
       '/root/repo/src/main/scala/graft/coverage/TpcdsVerbatim2Queries.scala']
TPCH_KIT = '/root/reference/flink-end-to-end-tests/test-scripts/test-data/tpch/modified-query'
TPCH_SRC = '/root/repo/src/main/scala/graft/coverage/TpchVerbatimQueries.scala'

def trim(body):
    while body and body[0].strip() == '': body.pop(0)
    while body and body[-1].strip() == '': body.pop()
    return '\n'.join(body)

def kit(name):
    txt = open(f'{KIT}/query{name}.sql').read()
    return trim([l for l in txt.split('\n')
                 if not l.startswith('-- start query') and not l.startswith('-- end query')])

def tpch_kit(name):
    return trim(open(f'{TPCH_KIT}/q{name}.sql').read().split('\n'))

VAL = r'  private val q(\w+?): String =\n"""(.*?)"""'
ok, bad = 0, []
for m in re.finditer(VAL, ''.join(open(f).read() for f in SRC), re.S):
    name, text = m.group(1), m.group(2)
    if kit(name) != text: bad.append(name)
    else: ok += 1
nh = 0
for m in re.finditer(VAL, open(TPCH_SRC).read(), re.S):
    name, text = m.group(1), m.group(2)
    if tpch_kit(name) != text: bad.append(f'tpch-q{name}')
    else: ok += 1; nh += 1
if nh < 4: bad.append(f'tpch: only {nh} of 4 modified texts embedded')
print(f'byte-identical: {ok} ({nh} tpch); mismatches: {bad}')
sys.exit(1 if bad else 0)
