from .base import Calculator  # noqa
from .lj import LJ, LennardJones  # noqa
from .emt import EMT  # noqa


def get_vasp(**kwargs):
    """VASP calculator factory (parity with gpr_calc/utilities.py:408-443).

    Requires a working ASE installation + VASP binaries; this framework
    drives it through the same ASE calculator interface.
    """
    try:
        from ase.calculators.vasp import Vasp
    except ImportError as exc:  # pragma: no cover
        raise ImportError(
            "get_vasp requires ASE (pip install ase) and a VASP setup; "
            "set ASE_VASP_COMMAND / VASP_PP_PATH as usual") from exc
    vasp_args = {
        "txt": "vasp.out", "prec": "Accurate", "encut": 400,
        "algo": "Fast", "xc": "pbe", "icharg": 2, "ediff": 1.0e-4,
        "ediffg": -0.03, "ismear": 1, "sigma": 0.1, "ibrion": -1,
        "isym": 0, "idipol": 3, "ldipol": True, "lwave": False,
        "lcharg": False, "lreal": "Auto", "npar": 2, "kpts": [2, 2, 1],
    }
    vasp_args.update(kwargs)
    return Vasp(**vasp_args)


def get_pyscf_calc(atoms, basis="gth-szv-molopt-sr", pseudo="gth-pade",
                   xc="lda,vwn"):
    """PySCF periodic-DFT calculator factory (parity with
    gpr_calc/calculator.py:294-309).  Requires pyscf + ASE."""
    try:
        from pyscf.pbc.tools import pyscf_ase
        import pyscf.pbc.gto as pbcgto
        import pyscf.pbc.dft as pbcdft
    except ImportError as exc:  # pragma: no cover
        raise ImportError("get_pyscf_calc requires pyscf "
                          "(pip install pyscf)") from exc
    cell = pbcgto.Cell()
    cell.a = atoms.cell
    cell.basis = basis
    cell.pseudo = pseudo
    cell.verbose = 0

    def mf_class(cell):
        return pbcdft.KRKS(cell, kpts=cell.make_kpts([1, 1, 1]))

    return pyscf_ase.PySCF(molcell=cell, mf_class=mf_class,
                           mf_dict={"xc": xc})
