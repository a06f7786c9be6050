"""Quick-start: on-the-fly GPR NEB for Au diffusion on Al(100).

Port of the reference quick-start (examples/emt-serial.py:1-35) to the
TPU-native framework; runs anywhere (CPU or TPU), no ASE required.
"""
from gpr_calculator_tpu import EMT, GP, GPR, get_images, neb_calc, plot_path

init = "/root/reference/examples/database/initial.traj"
final = "/root/reference/examples/database/final.traj"
num_images = 5
fmax = 0.05

# Run NEB with the plain EMT calculator
images = get_images(init, final, num_images)
neb = neb_calc(images, EMT(), fmax=fmax)
data = [(neb.images, neb.energies, f"EMT ({neb.nsteps*(len(images)-2)+2})")]

# Run NEB with on-the-fly GPR calculators
for (etol, ftol) in zip([0.05, 0.1], [0.05, 0.1]):
    images = get_images(init, final, num_images)

    gp = GP.set_GPR(images, EMT(),
                    noise_e=etol / len(images[0]),
                    noise_f=ftol)
    calc = GPR(base=EMT(), ff=gp, save=False)

    neb = neb_calc(images, calc, fmax=fmax, climb=True)
    N1, N2 = gp.use_base, gp.use_surrogate
    data.append((neb.images, neb.energies, f"GPR-{ftol:.2f} ({N1}/{N2})"))
    print(gp, "\n\n")

plot_path(data, figname="NEB-test.png", fontsize=16,
          title="Au diffusion on Al(100)")
