"""Prompt templates for MRG / VQA finetuning and evaluation.

The reference ships 43 caption prompts and 50 location-VQA prompts
(`dataset/prompt_templates.py`). These are our own template sets with the
same roles and interface; checkpoint-parity runs can load the reference's
exact strings from a JSON file via `load_templates`.
"""

from __future__ import annotations

import json
from typing import Dict, List

Caption_templates: List[str] = [
    "Please describe the findings in this chest CT volume.",
    "Generate a radiology report for the given CT scan.",
    "What abnormalities can be identified in this CT image?",
    "Summarize the key observations of this thoracic CT study.",
    "Write the findings section of a report for this volume.",
    "Describe any pathological changes visible in this scan.",
    "Provide a detailed reading of this chest CT examination.",
    "Report the radiological findings of the displayed CT volume.",
    "What does this CT scan of the chest show?",
    "Compose a diagnostic report based on this 3D image.",
    "Interpret the imaging findings of this chest CT.",
    "List the notable findings present in this CT study.",
    "Give a comprehensive description of this CT volume.",
    "What is your impression of this thoracic CT scan?",
    "Draft the findings for this patient's chest CT.",
    "Analyze this CT image and describe all abnormalities.",
]

VQA_location_templates: List[str] = [
    "Where is the {abnormality} located in this image?",
    "In which anatomical region can the {abnormality} be found?",
    "Identify the location of the {abnormality} in this CT scan.",
    "Which part of the chest shows the {abnormality}?",
    "Point out the anatomical position of the {abnormality}.",
    "What region of this volume contains the {abnormality}?",
    "Locate the {abnormality} in the displayed CT image.",
    "Which anatomy is affected by the {abnormality}?",
    "Tell me where the {abnormality} appears in this scan.",
    "Specify the site of the {abnormality} in this CT study.",
    "The {abnormality} in this image is situated in which region?",
    "Name the anatomical structure where the {abnormality} is seen.",
]

PosREC_templates: List[str] = [
    "Where is the {target} in this image? Give its bounding box.",
    "Output the 3D box coordinates of the {target}.",
    "Locate the {target} and answer with normalized coordinates.",
]

PosREG_templates: List[str] = [
    "What is inside the region {box}?",
    "Identify the structure within the bounding box {box}.",
    "Which organ occupies the region {box} of this volume?",
]

Seg_templates: List[str] = [
    "Please segment the {target} in this image. [SEG]",
    "Can you segment the {target}? [SEG]",
    "Produce a mask for the {target}. [SEG]",
]


def load_templates(path: str) -> Dict[str, List[str]]:
    """Load replacement template sets (e.g. the reference's exact strings
    exported to JSON) — keys: caption, vqa_location, posrec, posreg, seg."""
    with open(path) as f:
        return json.load(f)
