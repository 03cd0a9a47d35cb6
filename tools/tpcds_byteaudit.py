#!/usr/bin/env python3
"""Byte-identity audit of the embedded verbatim TPC-DS texts: every
`private val qN` in TpcdsVerbatim*Queries.scala must equal the reference
kit's query file minus the `-- start/end query` marker lines and
leading/trailing blank lines. Exit 1 on any mismatch."""
import re, sys

KIT = '/root/reference/flink-end-to-end-tests/flink-tpcds-test/tpcds-tool/query'
SRC = ['/root/repo/src/main/scala/graft/coverage/TpcdsVerbatimQueries.scala',
       '/root/repo/src/main/scala/graft/coverage/TpcdsVerbatim2Queries.scala']

def kit(name):
    txt = open(f'{KIT}/query{name}.sql').read()
    body = [l for l in txt.split('\n')
            if not l.startswith('-- start query') and not l.startswith('-- end query')]
    while body and body[0].strip() == '': body.pop(0)
    while body and body[-1].strip() == '': body.pop()
    return '\n'.join(body)

src = ''.join(open(f).read() for f in SRC)
ok, bad = 0, []
for m in re.finditer(r'  private val q(\w+?): String =\n"""(.*?)"""', src, re.S):
    name, text = m.group(1), m.group(2)
    if name == '17': continue  # not embedded as a hosted query
    if kit(name) != text: bad.append(name)
    else: ok += 1
print(f'byte-identical: {ok}; mismatches: {bad}')
sys.exit(1 if bad else 0)
