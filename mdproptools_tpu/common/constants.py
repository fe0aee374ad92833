"""
Physical constants and LAMMPS-unit-system -> SI conversion registries.

Mirrors the registry the reference keeps in
``mdproptools/common/constants.py:22-168`` (same constant values, same
seven supported unit systems, same dict names) so downstream property
modules convert units identically. Values are CODATA-2018 / SI-2019.
"""

import math

# --- fundamental constants (SI) -------------------------------------------
BOLTZMANN = 1.380649e-23  # J/K
ELEMENTARY_CHARGE = 1.602176634e-19  # C
AVOGADRO = 6.02214076e23  # 1/mol
LIGHT_SPEED = 299792458  # m/s
BOHR_RADIUS = 5.29177210903e-11  # m
CAL_TO_J = 4.184  # J/cal
HA_TO_J = 4.3597447222071e-18  # J/Hartree

SUPPORTED_UNITS = ["real", "metal", "si", "cgs", "electron", "micro", "nano"]

# --- per-quantity conversion factors to SI, keyed by LAMMPS unit system ----
# real: g/mol, Angstrom, fs, kcal/mol, atm, e
# metal: g/mol, Angstrom, ps, eV, bar, e
# cgs: g, cm, s, erg, dyne/cm^2, esu
# electron: g/mol, Bohr, fs, Hartree, Pa, e
# micro: pg, um, us, pg*um^2/us^2, pressure derived, pC
# nano: ag, nm, ns, ag*nm^2/ns^2, pressure derived, e

MASS_CONVERSION = {
    "real": 1e-3 / AVOGADRO,
    "metal": 1e-3 / AVOGADRO,
    "si": 1.0,
    "cgs": 1e-3,
    "electron": 1e-3 / AVOGADRO,
    "micro": 1e-15,
    "nano": 1e-21,
}

DISTANCE_CONVERSION = {
    "real": 1e-10,
    "metal": 1e-10,
    "si": 1.0,
    "cgs": 1e-2,
    "electron": BOHR_RADIUS,
    "micro": 1e-6,
    "nano": 1e-9,
}

TIME_CONVERSION = {
    "real": 1e-15,
    "metal": 1e-12,
    "si": 1.0,
    "cgs": 1.0,
    "electron": 1e-15,
    "micro": 1e-6,
    "nano": 1e-9,
}

ENERGY_CONVERSION = {
    "real": 1e3 * CAL_TO_J / AVOGADRO,
    "metal": ELEMENTARY_CHARGE,
    "si": 1.0,
    "cgs": 1e-7,
    "electron": HA_TO_J,
    "micro": MASS_CONVERSION["micro"],
    "nano": MASS_CONVERSION["nano"],
}

# electron-units velocity uses the atomic time unit 1.03275e-15 s, as the
# reference does (constants.py:84)
VELOCITY_CONVERSION = {
    u: DISTANCE_CONVERSION[u] / TIME_CONVERSION[u] for u in SUPPORTED_UNITS
}
VELOCITY_CONVERSION["electron"] = DISTANCE_CONVERSION["electron"] / 1.03275e-15

FORCE_CONVERSION = {
    u: ENERGY_CONVERSION[u] / DISTANCE_CONVERSION[u] for u in SUPPORTED_UNITS
}

TORQUE_CONVERSION = ENERGY_CONVERSION

TEMPERATURE_CONVERSION = {u: 1.0 for u in SUPPORTED_UNITS}

PRESSURE_CONVERSION = {
    "real": 101325.0,  # atm -> Pa
    "metal": 1e5,  # bar -> Pa
    "si": 1.0,
    "cgs": 0.1,  # dyne/cm^2 -> Pa (barye)
    "electron": 1.0,
    "micro": ENERGY_CONVERSION["micro"] / DISTANCE_CONVERSION["micro"] ** 3,
    "nano": ENERGY_CONVERSION["nano"] / DISTANCE_CONVERSION["nano"] ** 3,
}

VISCOSITY_CONVERSION = {
    "real": 0.1,  # Poise -> Pa*s
    "metal": 0.1,
    "si": 1.0,
    "cgs": 0.1,
    "electron": 1.0,
    "micro": PRESSURE_CONVERSION["micro"] * TIME_CONVERSION["micro"],
    "nano": PRESSURE_CONVERSION["nano"] * TIME_CONVERSION["nano"],
}

CHARGE_CONVERSION = {
    "real": ELEMENTARY_CHARGE,
    "metal": ELEMENTARY_CHARGE,
    "si": 1.0,
    "cgs": 0.1 / LIGHT_SPEED,  # statC/esu -> C
    "electron": ELEMENTARY_CHARGE,
    "micro": 1e-12,  # pC -> C
    "nano": ELEMENTARY_CHARGE,
}

DIPOLE_CONVERSION = {
    u: CHARGE_CONVERSION[u] * DISTANCE_CONVERSION[u] for u in SUPPORTED_UNITS
}
DIPOLE_CONVERSION["electron"] = 1e-21 / LIGHT_SPEED  # Debye -> C*m

ELECTRIC_FIELD_CONVERSION = {
    "real": 1 / DISTANCE_CONVERSION["real"],  # V/Angstrom -> V/m
    "metal": 1 / DISTANCE_CONVERSION["metal"],
    "si": 1.0,
    "cgs": FORCE_CONVERSION["cgs"] / CHARGE_CONVERSION["cgs"],
    "electron": 100.0,  # V/cm -> V/m
    "micro": 1 / DISTANCE_CONVERSION["micro"],
    "nano": 1 / DISTANCE_CONVERSION["nano"],
}

DENSITY_3D_CONVERSION = {
    "real": 1e3,  # g/cm^3 -> kg/m^3
    "metal": 1e3,
    "si": 1.0,
    "cgs": 1e3,
    "micro": MASS_CONVERSION["micro"] / DISTANCE_CONVERSION["micro"] ** 3,
    "nano": MASS_CONVERSION["nano"] / DISTANCE_CONVERSION["nano"] ** 3,
}

assert math.isclose(DENSITY_3D_CONVERSION["real"], 1e-3 / 1e-2 ** 3)
