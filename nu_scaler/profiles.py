"""Named settings profiles persisted as JSON — role of the legacy `Profile`
config system (`Nu_scale/src/ui/profile.rs:9-232`): name/source/tech/quality/
algorithm/fps/region saved under the user config dir."""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional


def config_dir() -> str:
    base = os.environ.get("XDG_CONFIG_HOME", os.path.expanduser("~/.config"))
    d = os.path.join(base, "nu_scaler")
    os.makedirs(d, exist_ok=True)
    return d


@dataclasses.dataclass
class Profile:
    name: str = "default"
    source: str = "fullscreen"  # fullscreen | window:<title> | region:x,y,w,h
    technology: str = "wgpu"
    quality: str = "quality"
    algorithm: str = "lanczos3"
    fps: int = 60
    scale: float = 2.0
    interpolation: bool = False
    interpolation_mode: str = "blend"  # blend | flow
    region: Optional[tuple[int, int, int, int]] = None

    def path(self) -> str:
        return os.path.join(config_dir(), f"{self.name}.json")

    def save(self) -> str:
        p = self.path()
        with open(p, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2)
        return p

    @staticmethod
    def load(name: str) -> "Profile":
        p = os.path.join(config_dir(), f"{name}.json")
        with open(p) as f:
            data = json.load(f)
        if data.get("region") is not None:
            data["region"] = tuple(data["region"])
        return Profile(**data)

    @staticmethod
    def list_profiles() -> list[str]:
        return sorted(
            os.path.splitext(n)[0]
            for n in os.listdir(config_dir())
            if n.endswith(".json")
        )

    @staticmethod
    def delete(name: str) -> bool:
        p = os.path.join(config_dir(), f"{name}.json")
        if os.path.exists(p):
            os.remove(p)
            return True
        return False
