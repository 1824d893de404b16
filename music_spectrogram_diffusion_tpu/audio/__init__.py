"""Audio featurization (mel frontend) and on-device vocoding."""
