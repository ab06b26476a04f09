import sys, time, cProfile, pstats
sys.path.insert(0, "/root/repo")
import jax; jax.config.update("jax_platforms", "cpu")
from hypergreco_tpu import runtime; runtime.init()
from hypergreco_tpu.models.bfv.circuit import BfvEncrypt
from hypergreco_tpu.models.bfv.witness_gen import generate_witness

args, consts = generate_witness(64, [82638181], seed=5)
bfv = BfvEncrypt(consts)
pk, vk = bfv.setup()
proof = bfv.prove(args, pk, device=False)
inputs_dense, _ = bfv.get_inputs(args)
bfv.verify(vk, inputs_dense, args["ct0is"], proof)
pr = cProfile.Profile(); pr.enable()
bfv.verify(vk, inputs_dense, args["ct0is"], proof)
pr.disable()
pstats.Stats(pr).sort_stats("cumulative").print_stats(25)
