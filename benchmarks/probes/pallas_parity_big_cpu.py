import sys
sys.path.insert(0, "/root/repo")
exec(open("/root/repo/benchmarks/pallas_parity_big.py").read().replace(
    "S = 2048", "S = 256").replace(
    "block_sims=512, interpret=False", "block_sims=128, interpret=True"))
