"""Read persisted parameter studies back.

Parity port of the reference ReaderParameterStudy
(nsol/reader_parameter_study.py:21-348): regex-discovers measure files,
parses the parameter lines, rebuilds the swept parameter dictionary
(natural-sorted, float-cast when possible), maps parameter tuples to result
rows, builds human-readable labels, and loads measure arrays / the
reconstructions npz.
"""

import os
import re

import numpy as np

from nsol_tpu.natsort import natsorted
from nsol_tpu.study.paths import ParameterStudy
from nsol_tpu.defaults import STUDY_FILE_EXTENSION

__all__ = ["ReaderParameterStudy"]

REGEX_FILENAMES = "[A-Za-z0-9+-_]+"


class ReaderParameterStudy(ParameterStudy):

    def __init__(self, directory, name):
        ParameterStudy.__init__(self, directory, name)
        self._lines_params = None

    def read_study(self):
        if not os.path.isdir(self._directory):
            raise ValueError("Directory '%s' does not exist"
                             % self._directory)
        self._measures = self._get_measure_names()
        if len(self._measures) == 0:
            raise RuntimeError("No measures to study '%s' found in '%s'"
                               % (self._name, self._directory))
        self._lines_params = self._read_parameter_file_lines()
        self._parameters_dic = self._get_parameters()
        for k, v in self._parameters_dic.items():
            if len(v) == 0:
                raise RuntimeError(
                    "Directory '%s' does not contain suitable parameter "
                    "study info" % self._directory)

    def get_reconstructions(self):
        path = self._get_path_to_file_reconstructions()
        if not os.path.isfile(path):
            raise IOError("File '%s' not available" % path)
        return np.load(path)

    def get_measures(self):
        self._check_that_study_was_read()
        return self._measures

    def get_file_header(self):
        self._check_that_study_was_read()
        with open(self._get_path_to_file_parameters()) as f:
            return f.readlines()[0]

    def get_results(self, measure):
        """(rows = parameter configs) × (cols = iterations) array."""
        return np.loadtxt(self._get_path_to_file_measures(measure),
                          skiprows=2)

    def get_computational_times(self):
        with open(self._get_path_to_file_computational_time()) as f:
            return [line.strip() for line in f.readlines()[2:]]

    def get_parameters(self):
        self._check_that_study_was_read()
        return self._parameters_dic

    def get_parameters_to_line(self):
        self._check_that_study_was_read()
        lines = self._lines_params[1:]
        return {tuple(line.split("\t")): i for i, line in enumerate(lines)}

    def get_lines_to_parameters(self, parameters):
        """Rows for a slice where exactly one key varies
        (nsol/reader_parameter_study.py:278-316)."""
        self._check_that_study_was_read()
        if parameters.keys() != self._parameters_dic.keys():
            raise ValueError(
                "Provided dictionary keys must match. Required keys for "
                "this study are " + str(self._parameters_dic.keys()))

        varying_key = None
        rows = 0
        for key in parameters:
            if isinstance(parameters[key], (tuple, list, np.ndarray)):
                if len(parameters[key]) == 1:
                    raise ValueError("Single entry in key '%s' must not be "
                                     "a list" % key)
                if len(parameters[key]) > 1:
                    if varying_key is None:
                        varying_key = key
                        rows = len(parameters[key])
                    else:
                        raise ValueError("Provided dictionary can only vary "
                                         "in a single key")

        parameters_to_line = self.get_parameters_to_line()
        lines = np.zeros(rows, dtype=int)
        for i in range(rows):
            key = []
            for k in parameters:
                key.append(str(parameters[k][i]) if k == varying_key
                           else str(parameters[k]))
            lines[i] = parameters_to_line[tuple(key)]
        return lines

    def get_line_to_parameter_labels(self, separator=", ", compact=False):
        self._check_that_study_was_read()
        lines = self._lines_params[1:]
        out = {}
        for i, line in enumerate(lines):
            if compact:
                out[i] = separator.join(line.split("\t"))
            else:
                out[i] = separator.join(
                    "%s=%s" % (k, v) for k, v in
                    zip(self._parameters_dic.keys(), line.split("\t")))
        return out

    # ------------------------------------------------------------------

    def _read_parameter_file_lines(self):
        with open(self._get_path_to_file_parameters()) as f:
            lines = f.readlines()[1:]
        return [re.sub("\n", "", re.sub("## ", "", line)) for line in lines]

    def _get_measure_names(self):
        pattern = (self._name + "_measure_(" + REGEX_FILENAMES + ")[.]"
                   + STUDY_FILE_EXTENSION)
        p = re.compile(pattern)
        return [p.match(f).group(1)
                for f in os.listdir(self._directory) if p.match(f)]

    def _get_parameters(self):
        lines = list(self._lines_params)
        parameters = lines[0].split("\t")
        lines = lines[1:]
        parameters_dic = {}
        for i, parameter in enumerate(parameters):
            vals = list(set(line.split("\t")[i] for line in lines))
            vals = natsorted(vals, key=lambda y: y.lower())
            try:
                vals = sorted(float(v) for v in vals)
            except ValueError:
                pass
            parameters_dic[parameter] = vals
        return parameters_dic

    def _check_that_study_was_read(self):
        if self._lines_params is None:
            raise UnboundLocalError("Execute 'read_study' first to get "
                                    "information on parameters.")
