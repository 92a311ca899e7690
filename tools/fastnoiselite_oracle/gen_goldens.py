import numpy as np, subprocess

def oracle(W,H,extx,exty,seed,octaves=8,freq=1.0,gain=0.6,lac=2.0):
    out = subprocess.run(["/tmp/fnl_dump",str(W),str(H),str(extx),str(exty),str(seed),str(octaves),str(freq),str(gain),str(lac)],capture_output=True,text=True).stdout
    return np.array([float(v) for v in out.split()], dtype=np.float32).reshape(W,H)

configs = {
    # the erosion_gpu.py terrain: shape 256^2, ext = simres * nscale/wscale = (256,256), seed 3
    "erosion_gpu_256": dict(W=256,H=256,extx=256.0,exty=256.0,seed=3.0),
    "default_ext_64x48": dict(W=64,H=48,extx=512.0,exty=512.0,seed=3.0),
    "odd_params": dict(W=32,H=32,extx=17.3,exty=29.1,seed=-2.5,octaves=5,freq=1.7,gain=0.45,lac=2.3),
    "single_octave": dict(W=32,H=32,extx=32.0,exty=32.0,seed=0.0,octaves=1),
}
out = {}
for name, c in configs.items():
    out[name] = oracle(c["W"],c["H"],c["extx"],c["exty"],c["seed"],c.get("octaves",8),c.get("freq",1.0),c.get("gain",0.6),c.get("lac",2.0))
np.savez_compressed("/root/repo/tests/data/fastnoiselite_goldens.npz", **out)
print({k: (v.shape, float(v.std())) for k,v in out.items()})
