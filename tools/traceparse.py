"""Aggregate the device XLA-Ops line of an xplane trace; group by rough category."""
import glob, collections, re, sys
from tensorflow.tsl.profiler.protobuf import xplane_pb2

d = sys.argv[1]
nsteps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
xs = glob.glob(d + '/plugins/profile/*/*.xplane.pb')
sp = xplane_pb2.XSpace()
sp.ParseFromString(open(xs[0], 'rb').read())


def cat(name):
    n = name.lower()
    if 'custom-call' in name and ('jvp' in n or 'lrn' in n or 'tpu_custom_call' in n): return 'lrn-pallas'
    if 'convolution' in n or 'conv' in n and 'fusion' in n: return 'conv'
    if 'select-and-scatter' in n: return 'pool-bwd'
    if 'reduce-window' in n: return 'pool-fwd'
    if 'copy' in n: return 'copy'
    if 'reshape' in n or 'bitcast' in n or 'transpose' in n: return 'reshape/transpose'
    if 'dynamic-slice' in n or 'while' in n or 'reverse' in n or 'iota' in n or 'rng' in n or 'threefry' in n: return 'jitter/rng'
    if 'fusion' in n: return 'fusion(other)'
    return 'other'


for p in sp.planes:
    if p.name != '/device:TPU:0':
        continue
    md = p.event_metadata
    agg = collections.Counter(); cnt = collections.Counter()
    for line in p.lines:
        if line.name != 'XLA Ops': continue
        for ev in line.events:
            name = md[ev.metadata_id].name
            agg[name] += ev.duration_ps
            cnt[name] += 1
    print(f"total: {sum(agg.values())/1e9/nsteps:.2f} ms/step")
    bycat = collections.Counter()
    for name, dd in agg.items():
        bycat[cat(name)] += dd
    for c, dd in bycat.most_common():
        print(f"  {dd/1e9/nsteps:7.3f} ms/step  {c}")
    print("top 30 ops:")
    for name, dd in agg.most_common(30):
        print(f"  {dd/1e9/nsteps:7.3f} ms/step x{cnt[name]//nsteps:4d}  [{cat(name):16s}] {name[:95]}")
