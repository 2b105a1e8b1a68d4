from .feature_stats import FeatureStats
from .frechet import frechet_distance, fid_from_stats
from .kernel import kid_from_features
from .precision_recall import precision_recall
from .inception import InceptionV3, load_inception
from .metric_main import calc_metric, register_metric, list_metrics
