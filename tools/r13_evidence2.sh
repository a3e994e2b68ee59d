#!/bin/bash
# Round-13 evidence pipeline, part 2 — the steps the first pipeline's
# session loss dropped. Strictly serialized Spark sessions.
cd /root/repo
export PYTHONPATH=/root/repo
set -x
date
# 1. finish the zero-skip sf0.1 full-registry sweep (chunks 0-180 are
#    already green in docs/probes; only 180-236 was lost mid-run)
python tools/parity_sweep.py /root/testdata/sf0.1 180 236 > /tmp/r13_sweep01_d.log 2>&1
echo "CHUNK_D_EXIT=$?"
date
# 2. regenerate docs/PLANS.md (now includes q34/q126/q238 pins)
python tools/explain_plans.py > /tmp/r13_plans.log 2>&1
echo "PLANS_EXIT=$?"
date
# 3. sf1 benchdata regen + targeted probes on this round's changed queries
python tools/make_benchdata.py 1.0 benchdata/sf1 > /tmp/r13_mkbench.log 2>&1
echo "MKBENCH_EXIT=$?"
date
python tools/parity_sweep.py benchdata/sf1 --only q125_copurchase_degrees,q126_triangle_count --guard-rows 20000000 > /tmp/r13_sf1_a.log 2>&1
echo "SF1_A_EXIT=$?"
date
python tools/parity_sweep.py benchdata/sf1 --only q238_simhash64_hamming_pairs --guard-rows 20000000 > /tmp/r13_sf1_b.log 2>&1
echo "SF1_B_EXIT=$?"
date
python tools/parity_sweep.py benchdata/sf1 --only q34_embedding_near_dup --guard-rows 20000000 > /tmp/r13_sf1_c.log 2>&1
echo "SF1_C_EXIT=$?"
date
echo PIPELINE2_DONE
