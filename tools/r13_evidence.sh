#!/bin/bash
# Round-13 evidence pipeline — strictly serialized Spark sessions.
cd /root/repo
set -x
date
# 1. full pytest
python -m pytest tests/ -x -q > /tmp/r13_pytest.log 2>&1
echo "PYTEST_EXIT=$?" | tee -a /tmp/r13_pytest.log
date
# 2. zero-skip full-registry sweep at sf0.1 (4 chunks)
python tools/parity_sweep.py /root/testdata/sf0.1 0 60    > /tmp/r13_sweep01_a.log 2>&1
python tools/parity_sweep.py /root/testdata/sf0.1 60 120  > /tmp/r13_sweep01_b.log 2>&1
python tools/parity_sweep.py /root/testdata/sf0.1 120 180 > /tmp/r13_sweep01_c.log 2>&1
python tools/parity_sweep.py /root/testdata/sf0.1 180 236 > /tmp/r13_sweep01_d.log 2>&1
date
# 3. sf1 benchdata regen + targeted probes on this round's changed queries
python tools/make_benchdata.py 1.0 benchdata/sf1 > /tmp/r13_mkbench.log 2>&1
python tools/parity_sweep.py benchdata/sf1 --only q125,q126 --guard-rows 20000000 > /tmp/r13_sf1_a.log 2>&1
python tools/parity_sweep.py benchdata/sf1 --only q238 --guard-rows 20000000 > /tmp/r13_sf1_b.log 2>&1
python tools/parity_sweep.py benchdata/sf1 --only q34 --guard-rows 20000000 > /tmp/r13_sf1_c.log 2>&1
date
echo PIPELINE_DONE
