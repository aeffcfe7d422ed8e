// Minimal boost::program_options stand-in covering exactly the surface the
// reference's main.cpp uses (main.cpp:20-157): options_description with
// chained add_options(), typed values with bound targets and defaults,
// positional args routed to one catch-all option, variables_map with
// count()/operator[]/as<T>(), store/notify, and operator<< help printing.
// Long options only ("--name=value" and "--name value").
#ifndef BOOST_STUB_PROGRAM_OPTIONS_HPP
#define BOOST_STUB_PROGRAM_OPTIONS_HPP

#include <map>
#include <memory>
#include <ostream>
#include <sstream>
#include <stdexcept>
#include <string>
#include <vector>

namespace boost {
namespace program_options {

template <class T>
T po_lexical(const std::string &s) {
  std::istringstream iss(s);
  T v{};
  iss >> v;
  if (iss.fail()) throw std::runtime_error("bad option value: " + s);
  return v;
}
template <>
inline std::string po_lexical<std::string>(const std::string &s) {
  return s;
}
template <>
inline std::vector<std::string> po_lexical<std::vector<std::string>>(
    const std::string &s) {
  return {s};
}

class value_semantic {
 public:
  virtual ~value_semantic() {}
  virtual void parse_into(const std::string &tok) const = 0;
  virtual void apply_default() const = 0;
};

template <class T>
class typed_value : public value_semantic {
 public:
  T *target_;
  bool has_default_ = false;
  T default_v_{};
  explicit typed_value(T *t) : target_(t) {}
  typed_value *default_value(const T &v) {
    has_default_ = true;
    default_v_ = v;
    return this;
  }
  void parse_into(const std::string &tok) const override {
    if (target_) *target_ = po_lexical<T>(tok);
  }
  void apply_default() const override {
    if (target_ && has_default_) *target_ = default_v_;
  }
};

template <class T>
typed_value<T> *value() {
  return new typed_value<T>(nullptr);
}
template <class T>
typed_value<T> *value(T *target) {
  return new typed_value<T>(target);
}

struct option_desc {
  std::string name;
  std::shared_ptr<const value_semantic> sem;  // null => presence flag
  std::string description;
};

class options_description;

class options_adder {
  options_description *desc_;

 public:
  explicit options_adder(options_description *d) : desc_(d) {}
  options_adder &operator()(const char *name, const char *description);
  options_adder &operator()(const char *name, const value_semantic *sem,
                            const char *description);
};

class options_description {
 public:
  std::string caption;
  std::vector<option_desc> options;
  explicit options_description(const std::string &cap = "") : caption(cap) {}
  options_adder add_options() { return options_adder(this); }
  options_description &add(const options_description &other) {
    options.insert(options.end(), other.options.begin(), other.options.end());
    return *this;
  }
  const option_desc *find(const std::string &name) const {
    for (const auto &o : options)
      if (o.name == name) return &o;
    return nullptr;
  }
};

inline options_adder &options_adder::operator()(const char *name,
                                                const char *description) {
  desc_->options.push_back({name, nullptr, description});
  return *this;
}
inline options_adder &options_adder::operator()(const char *name,
                                                const value_semantic *sem,
                                                const char *description) {
  desc_->options.push_back(
      {name, std::shared_ptr<const value_semantic>(sem), description});
  return *this;
}

inline std::ostream &operator<<(std::ostream &os,
                                const options_description &d) {
  os << d.caption << ":\n";
  for (const auto &o : d.options)
    os << "  --" << o.name << (o.sem ? " arg" : "") << "\t" << o.description
       << "\n";
  return os;
}

class positional_options_description {
 public:
  std::string catch_all;
  positional_options_description &add(const char *name, int max_count) {
    (void)max_count;
    catch_all = name;
    return *this;
  }
};

struct parsed_options {
  const options_description *desc = nullptr;
  std::map<std::string, std::vector<std::string>> values;
};

class variable_value {
  const std::vector<std::string> *toks_;

 public:
  explicit variable_value(const std::vector<std::string> *t) : toks_(t) {}
  template <class T>
  T as() const;
};
template <class T>
T variable_value::as() const {
  if (!toks_ || toks_->empty())
    throw std::runtime_error("option value missing");
  return po_lexical<T>((*toks_)[0]);
}
template <>
inline std::vector<std::string> variable_value::as<std::vector<std::string>>()
    const {
  if (!toks_) throw std::runtime_error("option value missing");
  return *toks_;
}

class variables_map {
 public:
  std::map<std::string, std::vector<std::string>> values;
  const options_description *desc = nullptr;
  std::size_t count(const std::string &name) const {
    return values.count(name);
  }
  variable_value operator[](const std::string &name) const {
    auto it = values.find(name);
    return variable_value(it == values.end() ? nullptr : &it->second);
  }
};

class command_line_parser {
  int argc_;
  const char *const *argv_;
  const options_description *desc_ = nullptr;
  const positional_options_description *pos_ = nullptr;

 public:
  command_line_parser(int argc, char *argv[]) : argc_(argc), argv_(argv) {}
  command_line_parser &options(const options_description &d) {
    desc_ = &d;
    return *this;
  }
  command_line_parser &positional(const positional_options_description &p) {
    pos_ = &p;
    return *this;
  }
  parsed_options run() const {
    parsed_options out;
    out.desc = desc_;
    for (int i = 1; i < argc_; ++i) {
      std::string arg = argv_[i];
      if (arg.size() > 2 && arg.compare(0, 2, "--") == 0) {
        std::string body = arg.substr(2);
        auto eq = body.find('=');
        std::string name = eq == std::string::npos ? body : body.substr(0, eq);
        const option_desc *opt = desc_ ? desc_->find(name) : nullptr;
        if (!opt) throw std::runtime_error("unknown option --" + name);
        if (opt->sem) {
          std::string val;
          if (eq != std::string::npos) {
            val = body.substr(eq + 1);
          } else if (i + 1 < argc_) {
            val = argv_[++i];
          } else {
            throw std::runtime_error("option --" + name + " requires a value");
          }
          out.values[name].push_back(val);
        } else {
          out.values[name];  // presence flag
        }
      } else {
        if (!pos_ || pos_->catch_all.empty())
          throw std::runtime_error("unexpected positional argument: " + arg);
        out.values[pos_->catch_all].push_back(arg);
      }
    }
    return out;
  }
};

inline void store(const parsed_options &parsed, variables_map &vm) {
  vm.values = parsed.values;
  vm.desc = parsed.desc;
}

inline void notify(variables_map &vm) {
  if (!vm.desc) return;
  for (const auto &o : vm.desc->options) {
    if (!o.sem) continue;
    auto it = vm.values.find(o.name);
    if (it != vm.values.end()) {
      for (const auto &tok : it->second) o.sem->parse_into(tok);
    } else {
      o.sem->apply_default();
    }
  }
}

}  // namespace program_options
}  // namespace boost

#endif
