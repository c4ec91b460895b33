"""In-the-wild demo pipeline (≙ reference `demo/`, SURVEY.md §2.6):
video -> YOLOv3 person detection -> SORT tracking -> HRNet 2D pose ->
COCO->H36M mapping -> batched 3D lifting -> rendering/video."""
