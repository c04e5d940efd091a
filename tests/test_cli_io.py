"""CLI + VTU output tests — mirrors the reference apps' behavior
(app/main_Diffusion.cc: prm-file handling, output files)."""

import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from dealii_slod_tpu.cli import main as cli_main


@pytest.fixture()
def rundir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


def test_cli_creates_prm_and_outputs(rundir):
    # first run with a missing prm writes the defaults (reference README:3)
    rc = cli_main(["diffusion", "--no-fine-solve"])
    assert rc == 0
    assert (rundir / "parameters.prm").exists()
    assert (rundir / "used_parameters_2.prm").exists()
    for f in ("solution_fine.vtu", "solution_coarse.vtu",
              "solution_coefficients.vtu"):
        root = ET.parse(rundir / f).getroot()
        piece = root.find(".//Piece")
        assert piece is not None
        names = {d.get("Name") for d in piece.iter("DataArray")}
        assert "connectivity" in names

    # fine VTU carries the LOD field with finite values
    root = ET.parse(rundir / "solution_fine.vtu").getroot()
    arr = [d for d in root.iter("DataArray")
           if d.get("Name") == "lod_solution"][0]
    v = np.fromstring(arr.text.replace("\n", " "), sep=" ")
    assert v.size == 81
    assert np.isfinite(v).all() and np.abs(v).max() > 0


def test_cli_reads_existing_prm(rundir):
    (rundir / "p.prm").write_text(
        "subsection Problem\n"
        "  set Oversampling = 2\n"
        "  set Number of global refinements = 2\n"
        "  set Number of subdivisions = 2\n"
        "  set Stabilize phi_LOD candidates = true\n"
        "  subsection Right hand side\n"
        "    set Function expression = 1\n"
        "  end\n"
        "end\n")
    rc = cli_main(["diffusion", "p.prm", "--no-fine-solve"])
    assert rc == 0
    used = (rundir / "used_parameters_2.prm").read_text()
    assert "set Oversampling = 2" in used
    assert "set Stabilize phi_LOD candidates = true" in used
