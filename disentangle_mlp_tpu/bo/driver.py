"""Automated β search: GP + EI with FID-in-the-loop.

Closes the loop the reference left manual (SURVEY.md C18 / §3.5): there,
five β-VAE-GAN runs were launched by hand, FIDs transcribed into
final_bo.py:33-36, and the next β picked off a plot. ``BetaSearch`` owns
that loop: seed observations → fit GP → maximize EI on the β grid → train
and score the proposed β via a user-supplied objective → repeat. The
objective is any ``beta -> fid`` callable; ``make_training_objective``
builds the real one (a full run_vaegan at that β). Per SURVEY §2.2 the
natural multi-chip extension is one β per chip group; on a single chip the
loop is sequential.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from .gp import GaussianProcess, expected_improvement

# The reference's hand-collected observations (final_bo.py:33-36), usable
# as seed data so the search continues from published history.
REFERENCE_OBSERVATIONS: Tuple[Tuple[float, float], ...] = (
    (1.0, 139.33), (50.0, 147.92), (75.0, 126.75),
    (100.0, 137.98), (150.0, 151.08),
)


@dataclasses.dataclass
class BetaSearch:
    objective: Callable[[float], float]
    grid_lo: float = 1.0
    grid_hi: float = 150.0
    grid_step: float = 1.0
    ell: float = 30.0
    sigma_f: float = 50.0
    xi: float = 0.01
    log_path: str = ""

    betas: List[float] = dataclasses.field(default_factory=list)
    fids: List[float] = dataclasses.field(default_factory=list)

    def seed(self, observations=REFERENCE_OBSERVATIONS) -> "BetaSearch":
        for b, f in observations:
            self.betas.append(float(b))
            self.fids.append(float(f))
        return self

    @property
    def grid(self) -> np.ndarray:
        return np.arange(self.grid_lo, self.grid_hi + self.grid_step,
                         self.grid_step)

    def fit_gp(self) -> GaussianProcess:
        return GaussianProcess(ell=self.ell, sigma_f=self.sigma_f).fit(
            np.asarray(self.betas), np.asarray(self.fids))

    def propose(self) -> float:
        """Next β = argmax EI over the grid, excluding already-tried points."""
        gp = self.fit_gp()
        ei = expected_improvement(gp, self.grid, xi=self.xi)
        tried = np.isin(self.grid, np.asarray(self.betas))
        ei = np.where(tried, -np.inf, ei)
        return float(self.grid[int(np.argmax(ei))])

    def observe(self, beta: float, fid: float) -> None:
        self.betas.append(float(beta))
        self.fids.append(float(fid))
        if self.log_path:
            with open(self.log_path, "w") as f:
                json.dump({"betas": self.betas, "fids": self.fids}, f,
                          indent=2)

    def run(self, n_iterations: int) -> Dict[str, float]:
        for _ in range(n_iterations):
            beta = self.propose()
            fid = float(self.objective(beta))
            self.observe(beta, fid)
            print(f"[bo] beta={beta:.1f} -> FID={fid:.2f}")
        i = int(np.argmin(self.fids))
        return {"best_beta": self.betas[i], "best_fid": self.fids[i]}


def make_training_objective(base_cfg, epochs: Optional[int] = None
                            ) -> Callable[[float], float]:
    """beta → final-epoch FID via a full β-VAE-GAN training run (the
    automated analogue of the reference's manual procedure)."""
    import dataclasses as dc

    from ..train.loop import run_vaegan

    def objective(beta: float) -> float:
        cfg = dc.replace(
            base_cfg, beta=float(beta),
            name=f"{base_cfg.name}_beta{beta:g}")
        if epochs is not None:
            cfg = dc.replace(cfg, epochs=epochs)
        cfg = cfg.finalize()
        result = run_vaegan(cfg)
        fid = result.get("FID", "N/A")
        if fid == "N/A":
            raise RuntimeError(
                "objective requires calc_fid with usable reference stats")
        return float(fid)

    return objective
